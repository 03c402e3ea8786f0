"""Reproducible composed experiments (the reference's paper runs).

headline — the titular cross-resolution pipeline: HR teacher →
prior-aided SR-GAN → student + residual KD → cross-resolution
verification/identification eval, as ONE config-driven run.
"""

from crfr.experiments.headline import HeadlineCfg, run_headline  # noqa: F401
