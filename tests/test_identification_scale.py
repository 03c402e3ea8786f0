"""Streaming/sharded top-k as the PRODUCTION identification path (VERDICT r2
next #1): entry-point parity with the dense golden, full open-set CMC, and
CLI-level runs on large synthetic galleries via precomputed embeddings."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crfr.eval.identification import (IdentificationResult,
                                      _dense_closed_set,
                                      closed_set_identification,
                                      open_set_identification, topk_matches)


def _embs(rng, labels, dim=64, noise=0.05):
    """Near-one-hot embeddings: label k → e_k + noise (distinct labels are
    near-orthogonal, so ranks are deterministic and tie-free)."""
    labels = np.asarray(labels)
    e = np.eye(dim, dtype=np.float32)[labels % dim]
    return e + rng.normal(0, noise, e.shape).astype(np.float32)


def test_closed_set_streaming_matches_dense(rng):
    """Entry point (streaming, multi-block) == dense golden on a gallery
    with multiple images per identity."""
    glabels = np.repeat(np.arange(40), 3)          # 120 rows, 3 per id
    plabels = rng.integers(0, 40, 64)
    g = _embs(rng, glabels, noise=0.2)
    p = _embs(rng, plabels, noise=0.3)
    res = closed_set_identification(p, g, plabels, glabels, max_rank=10,
                                    block=32)      # forces 4 scan blocks
    r1_d, cmc_d = _dense_closed_set(jnp.asarray(p), jnp.asarray(g),
                                    jnp.asarray(plabels),
                                    jnp.asarray(glabels), max_rank=10)
    assert res.rank1 == pytest.approx(float(jnp.mean(r1_d)))
    np.testing.assert_allclose(res.cmc, np.asarray(jnp.mean(cmc_d, axis=0)))


def test_closed_set_sharded_matches_dense(rng):
    """mesh-sharded gallery (8 fake devices, NON-divisible row count →
    padding path) == dense golden, through the entry point."""
    from crfr.parallel.mesh import make_mesh

    mesh = make_mesh(None)
    if mesh.devices.size < 2:
        pytest.skip("needs a multi-device mesh")
    glabels = np.arange(101)                        # 101 % 8 != 0
    plabels = rng.integers(0, 101, 32)
    g = _embs(rng, glabels, dim=128, noise=0.2)
    p = _embs(rng, plabels, dim=128, noise=0.3)
    res_sh = closed_set_identification(p, g, plabels, glabels, max_rank=5,
                                       mesh=mesh, block=16)
    res_st = closed_set_identification(p, g, plabels, glabels, max_rank=5)
    assert res_sh.rank1 == pytest.approx(res_st.rank1)
    np.testing.assert_allclose(res_sh.cmc, res_st.cmc)


def test_open_set_full_cmc(rng):
    """Open-set CMC is the real curve (monotone, rank-k semantics), not a
    rank-1 stub: a probe whose match is the gallery's 3rd-best scorer shows
    up at rank 3, and unmated probes never contribute to the CMC."""
    dim = 16
    g = np.eye(dim, dtype=np.float32)[:6]           # ids 0..5 enrolled
    glabels = np.arange(6)
    # probe 0: exact id 0 → rank 1. probe 1: a blend scoring ids 3,4 above
    # its true id 2 → rank 3. probe 2: unmated (id 9).
    p = np.stack([
        np.eye(dim, dtype=np.float32)[0],
        (0.5 * np.eye(dim, dtype=np.float32)[2]
         + 0.8 * np.eye(dim, dtype=np.float32)[3]
         + 0.7 * np.eye(dim, dtype=np.float32)[4]),
        np.eye(dim, dtype=np.float32)[9],
    ])
    plabels = np.array([0, 2, 9])
    mated = np.array([True, True, False])
    res = open_set_identification(p, g, plabels, glabels, mated,
                                  fpir_targets=(1e-1,), max_rank=5)
    assert isinstance(res, IdentificationResult)
    assert res.cmc.shape == (5,)
    np.testing.assert_allclose(res.cmc, [0.5, 0.5, 1.0, 1.0, 1.0])
    assert res.rank1 == pytest.approx(0.5)
    assert all(res.cmc[i] <= res.cmc[i + 1] + 1e-9 for i in range(4))


def test_topk_matches_masks_negative_labels(rng):
    """Gallery rows with label −1 (padding convention) never reach the
    top-k even when their raw similarity would win."""
    g = np.stack([np.ones(8, np.float32), np.ones(8, np.float32)])
    lbl = np.array([-1, 3])
    p = np.ones((1, 8), np.float32)
    s, l = topk_matches(p, g, lbl, k=2)
    assert l[0, 0] == 3
    assert l[0, 1] == -1 and s[0, 1] == -np.inf


def _run_cli(argv, capsys):
    from crfr.cli import main
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_cli_openset_npy(tmp_path, capsys, rng):
    """eval-openset --probe-npy mode: no model, streaming gallery, full CMC
    + TPIR in the JSON output."""
    glabels = np.arange(300)
    g = _embs(rng, glabels, dim=512, noise=0.05)
    mated = np.concatenate([np.ones(40, bool), np.zeros(20, bool)])
    plabels = np.concatenate([rng.integers(0, 300, 40),
                              np.arange(1000, 1020)])   # %512 ∉ [0,300)
    p = _embs(rng, plabels, dim=512, noise=0.05)
    paths = {}
    for name, arr in [("g", g), ("glab", glabels), ("p", p),
                      ("plab", plabels), ("mated", mated)]:
        paths[name] = str(tmp_path / f"{name}.npy")
        np.save(paths[name], arr)
    rc, out = _run_cli(
        ["eval-openset", "--probe-npy", paths["p"],
         "--probe-labels-npy", paths["plab"],
         "--gallery-npy", paths["g"],
         "--gallery-labels-npy", paths["glab"],
         "--mated-npy", paths["mated"], "--max-rank", "10"], capsys)
    assert rc == 0
    assert out["rank1"] > 0.95, out
    assert len(out["cmc"]) == 10
    assert out["cmc"][-1] >= out["cmc"][0]
    assert out["tpir_at_fpir"]


@pytest.mark.slow
def test_cli_openset_200k_gallery(tmp_path, capsys, rng):
    """BASELINE config 3 at distractor scale: 200k-row gallery, 1k probes,
    streamed — dense would need a 800 MB (N, M) buffer; this path's live
    set is O(N·(k+block)). Mated probes are exact copies of enrolled rows
    → rank1 must be ~1."""
    m, n, dim = 200_000, 1000, 64
    g = rng.normal(0, 1, (m, dim)).astype(np.float32)
    glabels = np.arange(m)
    sel = rng.integers(0, m, n // 2)
    p = np.concatenate([g[sel] + rng.normal(0, 1e-3, (n // 2, dim)
                                            ).astype(np.float32),
                        rng.normal(0, 1, (n - n // 2, dim)
                                   ).astype(np.float32)])
    plabels = np.concatenate([glabels[sel], np.full(n - n // 2, 10**7)])
    mated = np.concatenate([np.ones(n // 2, bool),
                            np.zeros(n - n // 2, bool)])
    paths = {}
    for name, arr in [("g", g), ("glab", glabels), ("p", p),
                      ("plab", plabels), ("mated", mated)]:
        paths[name] = str(tmp_path / f"{name}.npy")
        np.save(paths[name], arr)
    rc, out = _run_cli(
        ["eval-openset", "--probe-npy", paths["p"],
         "--probe-labels-npy", paths["plab"],
         "--gallery-npy", paths["g"],
         "--gallery-labels-npy", paths["glab"],
         "--mated-npy", paths["mated"]], capsys)
    assert rc == 0
    assert out["rank1"] > 0.99, out
    assert out["cmc"][-1] >= out["rank1"]


def test_cli_match_npy(tmp_path, capsys, rng):
    """`crfr match`: top-k identities per probe from an embedding bank."""
    glabels = np.arange(100)
    g = _embs(rng, glabels, dim=128, noise=0.02)
    p = _embs(rng, np.array([7, 42, 99]), dim=128, noise=0.05)
    np.save(tmp_path / "g.npy", g)
    np.save(tmp_path / "gl.npy", glabels)
    np.save(tmp_path / "p.npy", p)
    rc, out = _run_cli(
        ["match", "--gallery-npy", str(tmp_path / "g.npy"),
         "--gallery-labels-npy", str(tmp_path / "gl.npy"),
         "--probe-npy", str(tmp_path / "p.npy"), "--k", "3"], capsys)
    assert rc == 0
    assert out["gallery"] == 100 and out["k"] == 3
    assert [m["labels"][0] for m in out["matches"]] == [7, 42, 99]
    for m in out["matches"]:
        assert m["scores"] == sorted(m["scores"], reverse=True)


def test_cli_ijbc_npy_templates(tmp_path, capsys, rng):
    """eval-ijbc precomputed-template mode (1:N, G1/G2 averaging)."""
    subjects = np.arange(50)
    g1 = _embs(rng, subjects[:25], dim=64, noise=0.02)
    g2 = _embs(rng, subjects[25:], dim=64, noise=0.02)
    psub = rng.permutation(subjects)[:30]
    p = _embs(rng, psub, dim=64, noise=0.05)
    paths = {}
    for name, arr in [("p", p), ("ps", psub), ("g1", g1),
                      ("g1s", subjects[:25]), ("g2", g2),
                      ("g2s", subjects[25:])]:
        paths[name] = str(tmp_path / f"{name}.npy")
        np.save(paths[name], arr)
    rc, out = _run_cli(
        ["eval-ijbc", "--probe-tpl-npy", paths["p"],
         "--probe-subjects-npy", paths["ps"],
         "--g1-tpl-npy", paths["g1"], "--g1-subjects-npy", paths["g1s"],
         "--g2-tpl-npy", paths["g2"], "--g2-subjects-npy", paths["g2s"]],
        capsys)
    assert rc == 0
    assert out["rank1"] > 0.9, out
    assert "rank1_g1" in out and "rank1_g2" in out
    assert len(out["cmc"]) == 20
