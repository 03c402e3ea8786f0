from crfr.losses.arcface import (  # noqa: F401
    MarginHead,
    margin_logits,
    sharded_margin_ce,
    softmax_ce,
)
from crfr.losses.distill import residual_kd_loss  # noqa: F401
