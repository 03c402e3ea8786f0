"""int8 embedding banks (eval/bank.py): quantization fidelity, rank parity
of the s8×s8→s32 streaming/sharded scan with the float path, topk_matches
dispatch, file roundtrip, and CLI consumption of .npz galleries."""

import json

import numpy as np
import pytest

from crfr.eval.bank import (QuantBank, load_bank, quantize_bank, save_bank,
                            streaming_topk_q, topk_matches_bank)
from crfr.eval.identification import streaming_topk, topk_matches


def _embs(rng, labels, dim=64, noise=0.05):
    labels = np.asarray(labels)
    e = np.eye(dim, dtype=np.float32)[labels % dim]
    return (e + rng.normal(0, noise, e.shape)).astype(np.float32)


def test_quantize_dequantize_fidelity(rng):
    x = rng.normal(0, 1, (64, 512)).astype(np.float32)
    bank = quantize_bank(x)
    d = bank.dequantize()
    xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
    cos = (d * xn).sum(-1) / np.linalg.norm(d, axis=-1).clip(1e-12)
    assert cos.min() > 0.999, cos.min()
    assert bank.q.dtype == np.int8 and np.abs(bank.q).max() <= 127
    assert (bank.labels == np.arange(64)).all()         # default labels


def _gapped(rng, n_probes, n_gallery, dim=64, coeffs=(1.0, 0.8, 0.6, 0.4,
                                                      0.2)):
    """Probes built as explicit blends of distinct gallery axes: the top-k
    order is deterministic with score GAPS ≥ ~0.09 after normalization —
    far above int8 quantization noise (~0.01), so rank parity is exact."""
    g = np.eye(dim, dtype=np.float32)[:n_gallery]
    order = np.stack([rng.permutation(n_gallery)[:len(coeffs)]
                      for _ in range(n_probes)])
    p = np.zeros((n_probes, dim), np.float32)
    for i, row in enumerate(order):
        p[i, row] = coeffs
    return p, g, np.arange(n_gallery), order


def test_streaming_q_rank_parity_with_float(rng):
    """Quantized scan returns the same top-k labels (in order) as the
    float scan when score gaps exceed quantization noise, with scores
    within that noise."""
    p, g, glabels, order = _gapped(rng, 32, 40)
    bank = quantize_bank(g, glabels)
    sq, lq = streaming_topk_q(p, bank.q, bank.scale, bank.labels,
                              k=5, block=16)            # multi-block
    sf, lf = streaming_topk(p, g, glabels, k=5, block=16)
    np.testing.assert_array_equal(np.asarray(lq), np.asarray(lf))
    np.testing.assert_array_equal(np.asarray(lq), order)
    np.testing.assert_allclose(np.asarray(sq), np.asarray(sf), atol=0.02)


def test_sharded_bank_matches_streaming(rng):
    """Mesh-sharded quantized scan (non-divisible row count → padding
    path) == single-device quantized scan, through topk_matches_bank."""
    from crfr.parallel.mesh import make_mesh

    mesh = make_mesh(None)
    if mesh.devices.size < 2:
        pytest.skip("needs a multi-device mesh")
    p, g, glabels, _ = _gapped(rng, 16, 101, dim=128)   # 101 % 8 != 0
    bank = quantize_bank(g, glabels)
    s_sh, l_sh = topk_matches_bank(p, bank, k=5, block=16, mesh=mesh)
    s_st, l_st = topk_matches_bank(p, bank, k=5, block=16)
    np.testing.assert_array_equal(l_sh, l_st)
    np.testing.assert_allclose(s_sh, s_st, atol=1e-5)
    # approx selection inside the shard_map body
    s_ap, l_ap = topk_matches_bank(p, bank, k=5, block=16, mesh=mesh,
                                   approx=True)
    np.testing.assert_array_equal(l_ap, l_st)
    np.testing.assert_allclose(s_ap, s_st, atol=1e-5)


def test_topk_matches_dispatches_bank(rng):
    """identification.topk_matches accepts a QuantBank gallery and ranks
    identically to the float gallery it was built from."""
    p, g, glabels, _ = _gapped(rng, 8, 50, coeffs=(1.0, 0.7, 0.4))
    bank = quantize_bank(g, glabels)
    s_b, l_b = topk_matches(p, bank, bank.labels, k=3)
    s_f, l_f = topk_matches(p, g, glabels, k=3)
    np.testing.assert_array_equal(l_b, l_f)
    np.testing.assert_allclose(s_b, s_f, atol=0.02)
    # labels=None → the bank's stored labels
    s_n, l_n = topk_matches(p, bank, None, k=3)
    np.testing.assert_array_equal(l_n, l_b)


def test_approx_selection_parity(rng):
    """approx=True (binned lax.approx_max_k block selection — the serving
    fast path, 1.9× on v5e) returns the same labels/scores as the exact
    hierarchical selection when score gaps are clear, through both the
    float and quantized scans and the topk_matches dispatchers."""
    p, g, glabels, order = _gapped(rng, 16, 120, dim=128)
    sf, lf = streaming_topk(p, g, glabels, k=5, block=64, approx=True)
    np.testing.assert_array_equal(np.asarray(lf), order)
    bank = quantize_bank(g, glabels)
    sq, lq = streaming_topk_q(p, bank.q, bank.scale, bank.labels,
                              k=5, block=64, approx=True)
    np.testing.assert_array_equal(np.asarray(lq), order)
    np.testing.assert_allclose(np.asarray(sq), np.asarray(sf), atol=0.02)
    # dispatchers thread approx; exact and approx agree here
    s_a, l_a = topk_matches(p, g, glabels, k=5, block=64, approx=True)
    s_e, l_e = topk_matches(p, g, glabels, k=5, block=64)
    np.testing.assert_array_equal(l_a, l_e)
    np.testing.assert_allclose(s_a, s_e, atol=1e-6)
    s_b, l_b = topk_matches_bank(p, bank, k=5, block=64, approx=True)
    np.testing.assert_array_equal(l_b, order)


def test_cli_match_approx(tmp_path, capsys, rng):
    """`crfr match --approx` produces the same top-1 as the exact scan."""
    glabels = np.arange(80)
    g = _embs(rng, glabels, dim=128, noise=0.02)
    p = _embs(rng, np.array([3, 61]), dim=128, noise=0.05)
    np.save(tmp_path / "g.npy", g)
    np.save(tmp_path / "p.npy", p)
    rc, out = _run_cli(
        ["match", "--gallery-npy", str(tmp_path / "g.npy"),
         "--probe-npy", str(tmp_path / "p.npy"), "--k", "3", "--approx"],
        capsys)
    assert rc == 0
    assert [m["labels"][0] for m in out["matches"]] == [3, 61]


def test_bank_to_device(rng):
    """Device-resident bank (serving startup path) scores identically to
    the host bank and supports len/dequantize."""
    p, g, glabels, order = _gapped(rng, 8, 60, dim=64)
    host = quantize_bank(g, glabels)
    dev = host.to_device()
    assert len(dev) == len(host)
    np.testing.assert_allclose(dev.dequantize(), host.dequantize())
    s_h, l_h = topk_matches_bank(p, host, k=3, block=16)
    s_d, l_d = topk_matches_bank(p, dev, k=3, block=16, approx=True)
    np.testing.assert_array_equal(l_d, l_h)
    np.testing.assert_allclose(s_d, s_h, atol=1e-6)


def test_bank_roundtrip(tmp_path, rng):
    g = rng.normal(0, 1, (37, 96)).astype(np.float32)
    labels = rng.integers(0, 10, 37)
    bank = quantize_bank(g, labels)
    path = str(tmp_path / "bank.npz")
    save_bank(path, bank)
    back = load_bank(path)
    np.testing.assert_array_equal(back.q, bank.q)
    np.testing.assert_array_equal(back.scale, bank.scale)
    np.testing.assert_array_equal(back.labels, labels)
    assert len(back) == 37


def test_fused_kernel_matches_scan(rng):
    """The Pallas 3-phase top-k (interpret mode here; compiled on TPU)
    returns exactly the scan path's labels and scores."""
    from crfr.ops.bank_scan import bank_topk_fused

    p, g, glabels, order = _gapped(rng, 16, 400, dim=512)
    bank = quantize_bank(g, glabels)
    sf, lf = bank_topk_fused(p, bank.q, bank.scale, bank.labels, k=5,
                             tile=8, chunk=64, interpret=True)
    ss, ls = streaming_topk_q(p, bank.q, bank.scale, bank.labels,
                              k=5, block=64)
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(ls))
    np.testing.assert_array_equal(np.asarray(lf), order)
    np.testing.assert_allclose(np.asarray(sf), np.asarray(ss), atol=1e-6)


def test_fused_kernel_padding_and_masking(rng):
    """Bank rows not a multiple of the kernel chunk (padding) and label −1
    sentinel rows must never surface; probe count not a multiple of the
    int8 sublane (32) unpads correctly."""
    from crfr.ops.bank_scan import bank_topk_fused

    p, g, glabels, order = _gapped(rng, 7, 150, dim=256,
                                   coeffs=(1.0, 0.6, 0.3))
    labels = np.asarray(glabels).copy()
    # poison a non-selected row: best raw score but masked out
    victim = int(np.setdiff1d(np.arange(150), order.ravel())[0])
    g = g.copy()
    g[victim] = 10.0 * g[int(order[0, 0])]   # probe 0's best direction
    labels[victim] = -1
    bank = quantize_bank(g, labels)
    s, l = bank_topk_fused(p, bank.q, bank.scale, bank.labels, k=3,
                           tile=8, chunk=64, interpret=True)  # 150 % 64 != 0
    assert (np.asarray(l) != -1).all() or (np.asarray(s)[np.asarray(l) == -1]
                                           == -np.inf).all()
    assert victim not in np.asarray(l)
    np.testing.assert_array_equal(np.asarray(l), order)


def _run_cli(argv, capsys):
    from crfr.cli import main
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_cli_match_npz_bank(tmp_path, capsys, rng):
    """`crfr match` against an int8 .npz bank: same answers as the float
    bank, gallery labels read from the bank itself."""
    glabels = np.arange(100)
    g = _embs(rng, glabels, dim=128, noise=0.02)
    p = _embs(rng, np.array([7, 42, 99]), dim=128, noise=0.05)
    save_bank(str(tmp_path / "g.npz"), quantize_bank(g, glabels))
    np.save(tmp_path / "p.npy", p)
    rc, out = _run_cli(
        ["match", "--gallery-npy", str(tmp_path / "g.npz"),
         "--probe-npy", str(tmp_path / "p.npy"), "--k", "3"], capsys)
    assert rc == 0
    assert out["gallery"] == 100 and out["k"] == 3
    assert [m["labels"][0] for m in out["matches"]] == [7, 42, 99]


def test_cli_openset_npz_bank(tmp_path, capsys, rng):
    """eval-openset consumes a .npz bank gallery (no --gallery-labels-npy
    needed) and reproduces the float-gallery result."""
    glabels = np.arange(300)
    g = _embs(rng, glabels, dim=512, noise=0.05)
    mated = np.concatenate([np.ones(40, bool), np.zeros(20, bool)])
    plabels = np.concatenate([rng.integers(0, 300, 40),
                              np.arange(1000, 1020)])
    p = _embs(rng, plabels, dim=512, noise=0.05)
    save_bank(str(tmp_path / "g.npz"), quantize_bank(g, glabels))
    np.save(tmp_path / "p.npy", p)
    np.save(tmp_path / "plab.npy", plabels)
    np.save(tmp_path / "mated.npy", mated)
    rc, out = _run_cli(
        ["eval-openset", "--probe-npy", str(tmp_path / "p.npy"),
         "--probe-labels-npy", str(tmp_path / "plab.npy"),
         "--gallery-npy", str(tmp_path / "g.npz"),
         "--mated-npy", str(tmp_path / "mated.npy"),
         "--max-rank", "10"], capsys)
    assert rc == 0
    assert out["rank1"] > 0.95, out
    assert len(out["cmc"]) == 10 and out["tpir_at_fpir"]
