"""approx_max_k recall on ADVERSARIAL gallery distributions (r3 VERDICT
Next #7): the serving fast path's recall bound must be stated and tested,
not inferred from random vectors.

What `identification._approx_cfg` documents, pinned here:

1. top-1 is STRUCTURALLY exact for any input/layout (the binned reduction
   keeps each bin's max; the global max is the max of its own bin).
2. Contiguous near-duplicate rows — the natural clustered-gallery layout
   (one identity's templates stored together) — keep full recall: bins
   stride the index space, so adjacent rows land in distinct bins.
3. The adversarial layout is top-k rows at positions ALIASING the bin
   stride: recall@10 measured 0.2 at stride 128 (M=8192, default target
   0.95, CPU lowering). `approx=0.999` (recall_target) restores full
   recall at every stride tried — that is the supported mitigation,
   exposed as `--approx-recall` / `?recall=`.

The tests avoid hard-coding which stride collapses (it depends on the
backend's bin layout and may shift across jax versions): they sweep
strides and assert the GUARANTEES (1, 2, and that 0.999 rescues every
swept layout), while the default-target collapse is only reported.
"""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from crfr.eval.bank import quantize_bank, streaming_topk_q, topk_matches_bank
from crfr.eval.identification import streaming_topk, topk_matches

M, K, D = 4096, 8, 64
STRIDES = (1, 2, 16, 32, 64, 128, 256)   # 1 = contiguous cluster


def _aliased_gallery(rng, stride: int, n_probes: int = 8):
    """Gallery of M unit rows; per probe, K 'hot' rows (clear score gaps,
    descending 0.99..0.92 of the probe direction) placed at positions
    j, j+stride, j+2·stride, … — the bin-aliasing layout. Cold rows are
    random unit vectors scoring ≈ N(0, 1/√D) ≲ 0.4."""
    g = rng.normal(0, 1, (M, D)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    probes = rng.normal(0, 1, (n_probes, D)).astype(np.float32)
    probes /= np.linalg.norm(probes, axis=1, keepdims=True)
    expect = []
    coeffs = 0.99 - 0.01 * np.arange(K)          # gaps ≫ int8 quant noise
    for i in range(n_probes):
        j = int(rng.integers(0, M - K * stride))
        pos = j + stride * np.arange(K)
        ortho = rng.normal(0, 1, (K, D)).astype(np.float32)
        ortho -= (ortho @ probes[i])[:, None] * probes[i]
        ortho /= np.linalg.norm(ortho, axis=1, keepdims=True)
        g[pos] = (coeffs[:, None] * probes[i]
                  + np.sqrt(1 - coeffs[:, None] ** 2) * ortho)
        expect.append(pos)
    return probes, g, np.arange(M), np.stack(expect)


def _recall(approx_labels, exact_labels):
    a, e = np.asarray(approx_labels), np.asarray(exact_labels)
    return np.mean([len(np.intersect1d(a[i], e[i])) / e.shape[1]
                    for i in range(e.shape[0])])


@pytest.mark.parametrize("stride", STRIDES)
def test_top1_structurally_exact(rng, stride):
    """Guarantee 1: approx top-1 == exact top-1 for EVERY layout, float
    and quantized scans, at the default recall target."""
    p, g, lbl, expect = _aliased_gallery(rng, stride)
    _, le = streaming_topk(p, g, lbl, k=K, block=M)
    _, la = streaming_topk(p, g, lbl, k=K, block=M, approx=True)
    np.testing.assert_array_equal(np.asarray(la)[:, 0], np.asarray(le)[:, 0])
    np.testing.assert_array_equal(np.asarray(le)[:, 0], expect[:, 0])
    bank = quantize_bank(g, lbl)
    _, lq = streaming_topk_q(p, bank.q, bank.scale, bank.labels,
                             k=K, block=M, approx=True)
    np.testing.assert_array_equal(np.asarray(lq)[:, 0], expect[:, 0])


def test_contiguous_near_duplicates_full_recall(rng):
    """Guarantee 2: the natural clustered layout (near-duplicate rows
    stored contiguously) keeps recall 1.0 at the default target."""
    p, g, lbl, expect = _aliased_gallery(rng, stride=1)
    _, le = streaming_topk(p, g, lbl, k=K, block=M)
    _, la = streaming_topk(p, g, lbl, k=K, block=M, approx=True)
    assert _recall(la, le) == 1.0
    np.testing.assert_array_equal(np.sort(np.asarray(la)), np.sort(expect))


def _binned_lowering() -> bool:
    """Probe whether approx_max_k lowers to the binned PartialReduce here.

    The lowering is ENVIRONMENT-dependent, not just backend-dependent
    (measured 2026-08: CPU selected via env ``JAX_PLATFORMS=cpu`` → binned,
    stride-64 hot rows collapse; CPU selected via
    ``jax.config.update('jax_platforms', 'cpu')`` with the TPU PJRT plugin
    still registered — this suite's conftest — → exact top-k fallback,
    recall 1.0 at any stride/target). TPU always lowers binned. Two hot
    values at a bin-aliasing stride with an aggressive recall_target
    distinguish the two without depending on the exact bin count."""
    v = np.zeros((1, 4096), np.float32)
    v[0, 128] = 10.0
    v[0, 128 + 2048] = 9.0
    import jax

    _, idx = jax.lax.approx_max_k(jnp.asarray(v), 2, recall_target=0.5)
    return set(np.asarray(idx)[0]) != {128, 128 + 2048}


def test_high_recall_target_defeats_aliasing(rng):
    """Guarantee 3: approx=0.999 restores full top-k recall on every
    swept stride, including the ones that collapse at the default target
    (the documented mitigation). Where the lowering is binned (TPU; see
    ``_binned_lowering``), the sweep must also contain a genuinely
    adversarial case (< 0.9 default recall) so the mitigation is proven
    against a real collapse, not vacuously."""
    worst_default = 1.0
    for stride in STRIDES:
        p, g, lbl, _ = _aliased_gallery(rng, stride)
        _, le = streaming_topk(p, g, lbl, k=K, block=M)
        _, ld = streaming_topk(p, g, lbl, k=K, block=M, approx=True)
        _, lh = streaming_topk(p, g, lbl, k=K, block=M, approx=0.999)
        r_def, r_hi = _recall(ld, le), _recall(lh, le)
        worst_default = min(worst_default, r_def)
        assert r_hi == 1.0, (stride, r_hi)
    if not _binned_lowering():
        pytest.skip("approx_max_k lowers to exact top-k in this env "
                    "(guarantees above still asserted; collapse "
                    "unreachable in-process) — the binned-path collapse "
                    "IS pinned every run by "
                    "test_collapse_and_rescue_pinned_in_subprocess on the "
                    f"real chip; worst default here {worst_default}")
    # binned lowering: the sweep is adversarial by construction; if a
    # future bin layout makes every stride safe, re-derive the aliasing
    # layout rather than deleting the guarantee above
    assert worst_default < 0.9, (
        f"no swept stride was adversarial (worst default recall "
        f"{worst_default}); re-derive the aliasing layout for this backend")


def test_collapse_and_rescue_pinned_in_subprocess():
    """r4 VERDICT Next #5: the default-target stride-aliasing COLLAPSE
    (and its 0.999 rescue) must execute in every suite run, not only
    out-of-band. This suite's conftest selects CPU in-process, and on
    this jax version EVERY CPU selection lowers approx_max_k to exact
    top-k (verified: in-process config update AND env JAX_PLATFORMS=cpu
    without the axon plugin both give recall 1.0 at all strides) — the
    binned PartialReduce is the TPU lowering. So the collapse is
    exercised in a child process on the sandbox's default backend (the
    real chip), same subprocess pattern as tests/test_multihost.py.
    Skips only when no TPU is attached (pure-CPU dev box)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_approx_worker.py")
    out = subprocess.run([sys.executable, worker], cwd=repo,
                         env=dict(os.environ),
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    vals = dict(line.split(None, 1) for line in out.stdout.splitlines()
                if line.split(None, 1)[0] in ("BACKEND", "BINNED",
                                              "WORST", "RESCUE"))
    if vals.get("BACKEND") != "tpu":
        pytest.skip(f"no TPU backend in subprocess (got "
                    f"{vals.get('BACKEND')}); the binned lowering — and "
                    "the collapse — is unreachable on this host")
    assert vals["BINNED"] == "True", (
        "TPU no longer lowers approx_max_k to the binned reduction — "
        f"re-derive where the collapse is reachable ({out.stdout!r})")
    assert float(vals["WORST"]) < 0.9, (
        "no swept stride collapsed at the default recall target — "
        "re-derive the aliasing layout for this backend's bin count")
    assert float(vals["RESCUE"]) == 1.0, vals


def test_float_recall_flag_through_dispatchers(rng):
    """approx=0.999 flows through topk_matches / topk_matches_bank (jit
    static args, lru_cache keys) and matches the exact path on an
    adversarial layout; CLI --approx-recall maps to the same flag."""
    stride = 128
    p, g, lbl, _ = _aliased_gallery(rng, stride)
    s_e, l_e = topk_matches(p, g, lbl, k=K, block=M)
    s_h, l_h = topk_matches(p, g, lbl, k=K, block=M, approx=0.999)
    np.testing.assert_array_equal(l_h, l_e)
    np.testing.assert_allclose(s_h, s_e, atol=1e-6)

    bank = quantize_bank(g, lbl)
    _, lb_e = topk_matches_bank(p, bank, k=K, block=M)
    _, lb_h = topk_matches_bank(p, bank, k=K, block=M, approx=0.999)
    np.testing.assert_array_equal(lb_h, lb_e)

    # approx >= 1.0 degrades to the exact path (same compiled program
    # contract as approx=False)
    _, l1 = topk_matches(p, g, lbl, k=K, block=M, approx=1.0)
    np.testing.assert_array_equal(l1, l_e)

    from crfr.cli import _approx_flag

    class A:
        approx = False
        approx_recall = 0.999

    assert _approx_flag(A()) == 0.999
    A.approx_recall = 0.0
    assert _approx_flag(A()) is False
    A.approx = True
    assert _approx_flag(A()) is True
