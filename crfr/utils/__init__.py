from crfr.utils.logging import MetricsWriter  # noqa: F401
