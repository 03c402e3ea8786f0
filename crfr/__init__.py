"""crfr — TPU-native cross-resolution face recognition.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``HyoKong/Cross-Resolution-Face-Recognition`` (prior-aided face hallucination +
residual knowledge distillation for cross-resolution face recognition,
arXiv:1905.10777), designed TPU-first:

- preprocessing (5-pt similarity alignment, bicubic degradation, normalization)
  expressed as static-shape matmuls / fused Pallas kernels (MXU-friendly),
- IR/IR-SE embedding backbones in Flax NNX, jitted, NHWC, bf16-compute capable,
- ArcFace margin head with a class-sharded (PartialFC-style) distributed
  softmax-CE over a ``jax.sharding.Mesh``,
- verification / identification evaluation as single jitted matmul pipelines,
- cross-resolution extras: teacher→student residual knowledge distillation and
  prior-aided face hallucination (SR GAN).

NOTE on citations: the read-only reference mount at /root/reference was empty
in every session so far (see SURVEY.md §0); behavioural parity targets are
taken from the driver's BASELINE.json contract and the associated paper, and
each module's docstring states which part of that contract it implements.
"""

__version__ = "0.1.0"

from crfr import configs  # noqa: F401
