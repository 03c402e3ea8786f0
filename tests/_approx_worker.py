"""Subprocess worker for the approx_max_k BINNED-lowering half of
tests/test_approx_adversarial.py (r4 VERDICT Weak #5 / Next #5).

The parent suite's conftest selects CPU in-process, and on this jax
version every CPU selection (in-process config update OR env
``JAX_PLATFORMS=cpu`` without the axon plugin) lowers ``approx_max_k``
to exact top-k — the stride-aliasing collapse is a TPU-lowering
behavior (the binned PartialReduce). So this worker runs in a child
process with the UNMODIFIED sandbox env (axon TPU backend): the
collapse and its 0.999 rescue execute on the real chip in every CI run
rather than living in a session note.

Prints machine-parseable lines the parent asserts on:

  BACKEND <name>     — the child's jax.default_backend()
  BINNED <bool>      — the lowering probe (True on TPU)
  WORST <float>      — min default-target recall@K over the stride sweep
  RESCUE <float>     — min recall@K at recall_target=0.999 over the sweep
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from test_approx_adversarial import (  # noqa: E402
    K, M, STRIDES, _aliased_gallery, _binned_lowering, _recall)

from crfr.eval.identification import streaming_topk  # noqa: E402


def main() -> None:
    import jax

    print("BACKEND", jax.default_backend(), flush=True)
    print("BINNED", _binned_lowering(), flush=True)
    rng = np.random.default_rng(1234)
    worst_default, worst_rescue = 1.0, 1.0
    for stride in STRIDES:
        # shapes are stride-independent → 3 compiled programs total
        p, g, lbl, _ = _aliased_gallery(rng, stride)
        _, le = streaming_topk(p, g, lbl, k=K, block=M)
        _, ld = streaming_topk(p, g, lbl, k=K, block=M, approx=True)
        _, lh = streaming_topk(p, g, lbl, k=K, block=M, approx=0.999)
        worst_default = min(worst_default, _recall(ld, le))
        worst_rescue = min(worst_rescue, _recall(lh, le))
    print("WORST", worst_default, flush=True)
    print("RESCUE", worst_rescue, flush=True)


if __name__ == "__main__":
    main()
