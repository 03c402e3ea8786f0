from crfr.data.synthetic import SyntheticFaces  # noqa: F401
