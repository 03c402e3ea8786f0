from crfr.models.irse import IRBackbone, build_backbone  # noqa: F401
