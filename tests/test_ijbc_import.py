"""IJB-C template protocol fidelity + torch state_dict import roundtrip."""

import numpy as np
import pytest

import jax.numpy as jnp
from flax import nnx

from crfr.eval.ijbc import (ijbc_11, ijbc_1n, make_template_index,
                            pool_templates, tar_at_far_exact)


def test_template_pooling_media_aware(rng):
    """A template with one 3-frame video + one still: video frames must
    count as ONE media (else the video dominates)."""
    d = 8
    v = rng.normal(0, 1, (1, d)).astype(np.float32)
    video = np.repeat(v, 3, axis=0)                 # 3 identical frames
    still = rng.normal(0, 1, (1, d)).astype(np.float32)
    embs = np.concatenate([video, still])
    template_ids = np.array([7, 7, 7, 7])
    media_ids = np.array([0, 0, 0, 1])              # frames share media 0
    media_seg, tpl_of_media, tpl_uids = make_template_index(template_ids,
                                                            media_ids)
    tpl = pool_templates(jnp.asarray(embs), jnp.asarray(media_seg),
                         jnp.asarray(tpl_of_media),
                         int(media_seg.max()) + 1, len(tpl_uids))
    expect = (v[0] + still[0]) / 2
    expect = expect / np.linalg.norm(expect)
    np.testing.assert_allclose(np.asarray(tpl[0]), expect, atol=1e-5)
    assert tpl_uids.tolist() == [7]


def test_tar_at_far_exact_counts(rng):
    # 1000 impostors at scores < 0, 100 genuine at > 0.5 → TAR=1 @ any FAR
    neg = rng.uniform(-1, 0, 1000)
    pos = rng.uniform(0.5, 1, 100)
    scores = np.concatenate([pos, neg])
    issame = np.concatenate([np.ones(100, bool), np.zeros(1000, bool)])
    t = tar_at_far_exact(scores, issame, (1e-3, 1e-2, 1e-1))
    assert t[1e-3] == 1.0 and t[1e-1] == 1.0
    # overlap case: genuine uniformly mixed with impostors → TAR ≈ FAR-ish
    pos2 = rng.uniform(-1, 0, 500)
    sc = np.concatenate([pos2, neg])
    ls = np.concatenate([np.ones(500, bool), np.zeros(1000, bool)])
    t2 = tar_at_far_exact(sc, ls, (1e-1,))
    assert 0.02 < t2[1e-1] < 0.25


def test_ijbc_11_end_to_end(rng):
    d, n_subj = 16, 10
    protos = rng.normal(0, 1, (n_subj, d)).astype(np.float32)
    # 3 templates per subject, each with 1-2 media of 1-3 images
    embs, tids, mids = [], [], []
    tpl_subject = {}
    tid = 0
    mid = 0
    for s in range(n_subj):
        for _ in range(3):
            for _m in range(rng.integers(1, 3)):
                for _i in range(rng.integers(1, 4)):
                    embs.append(protos[s] + rng.normal(0, 0.1, d))
                    tids.append(tid)
                    mids.append(mid)
                mid += 1
            tpl_subject[tid] = s
            tid += 1
    embs = np.asarray(embs, np.float32)
    tids = np.asarray(tids)
    mids = np.asarray(mids)
    # pairs: 200 genuine + 2000 impostor
    all_t = np.asarray(sorted(tpl_subject))
    t1, t2, lab = [], [], []
    while len(lab) < 200:
        a, b = rng.choice(all_t, 2, replace=False)
        if tpl_subject[a] == tpl_subject[b]:
            t1.append(a), t2.append(b), lab.append(1)
    while len(lab) < 2200:
        a, b = rng.choice(all_t, 2, replace=False)
        if tpl_subject[a] != tpl_subject[b]:
            t1.append(a), t2.append(b), lab.append(0)
    res = ijbc_11(embs, tids, mids, np.asarray(t1), np.asarray(t2),
                  np.asarray(lab), far_targets=(1e-2, 1e-1))
    assert res.tar_at_far[1e-1] > 0.95
    assert res.tar_at_far[1e-2] > 0.9


def test_ijbc_1n(rng):
    d = 16
    protos = rng.normal(0, 1, (20, d)).astype(np.float32)
    gallery = protos[:12] + rng.normal(0, 0.05, (12, d)).astype(np.float32)
    g_subj = np.arange(12)
    probes = protos + rng.normal(0, 0.05, protos.shape).astype(np.float32)
    p_subj = np.arange(20)                   # 12 mated + 8 unmated
    res = ijbc_1n(probes, p_subj, gallery, g_subj, fpir_targets=(0.25,))
    assert res.rank1 == 1.0
    assert res.tpir_at_fpir[0.25] > 0.8


def test_ijbc_1n_two_gallery_averages(rng):
    """G1/G2 split averaging: avg result == mean of per-split results, and
    an asymmetric construction (G1 clean, G2 noisy) yields avg strictly
    between them."""
    from crfr.eval.ijbc import ijbc_1n_two_gallery

    d = 16
    protos = rng.normal(0, 1, (20, d)).astype(np.float32)
    g1 = protos[:10] + rng.normal(0, 0.02, (10, d)).astype(np.float32)
    # G2 is deterministically broken: every entry holds ANOTHER subject's
    # prototype (labels rolled by 5) → rank-1 must be 0 there.
    g2 = protos[10 + (np.arange(10) + 5) % 10]
    probes = protos + rng.normal(0, 0.05, protos.shape).astype(np.float32)
    p_subj = np.arange(20)
    avg, r1, r2 = ijbc_1n_two_gallery(
        probes, p_subj, g1, np.arange(10), g2, np.arange(10, 20),
        fpir_targets=(0.25,))
    assert avg.rank1 == pytest.approx(0.5 * (r1.rank1 + r2.rank1))
    np.testing.assert_allclose(avg.cmc, 0.5 * (np.asarray(r1.cmc)
                                               + np.asarray(r2.cmc)))
    assert avg.tpir_at_fpir[0.25] == pytest.approx(
        0.5 * (r1.tpir_at_fpir[0.25] + r2.tpir_at_fpir[0.25]))
    assert r1.rank1 == 1.0 and r2.rank1 == 0.0       # asymmetry is visible
    assert avg.rank1 == pytest.approx(0.5)


def test_ijbc_1n_approx_matches_exact(rng):
    """approx=True (binned approx_max_k selection) threads through the
    IJB-C 1:N entry points and agrees with the exact scan here."""
    from crfr.eval.ijbc import ijbc_1n_two_gallery

    d = 32
    protos = rng.normal(0, 1, (40, d)).astype(np.float32)
    # distractor-augmented galleries: 20 enrolled + 236 distractors each
    def gal(lo, hi, salt):
        enrolled = protos[lo:hi] + rng.normal(0, 0.05, (hi - lo, d))
        junk = rng.normal(0, 1, (236, d)).astype(np.float32) + salt
        subj = np.concatenate([np.arange(lo, hi), -np.ones(236, int) - 2])
        # label <0 rows are masked; use unique fake subjects instead
        subj[hi - lo:] = 1000 + np.arange(236)
        return np.concatenate([enrolled, junk]).astype(np.float32), subj

    g1, s1 = gal(0, 20, 0.0)
    g2, s2 = gal(20, 40, 0.1)
    probes = (protos + rng.normal(0, 0.05, protos.shape)).astype(np.float32)
    p_subj = np.arange(40)
    kw = dict(fpir_targets=(0.25,), max_rank=10, block=64)
    a_ex, _, _ = ijbc_1n_two_gallery(probes, p_subj, g1, s1, g2, s2, **kw)
    a_ap, _, _ = ijbc_1n_two_gallery(probes, p_subj, g1, s1, g2, s2,
                                     approx=True, **kw)
    assert a_ap.rank1 == pytest.approx(a_ex.rank1)
    np.testing.assert_allclose(a_ap.cmc, a_ex.cmc)
    assert a_ap.tpir_at_fpir[0.25] == pytest.approx(a_ex.tpir_at_fpir[0.25])


def test_pool_meta_subjects(rng):
    from crfr.eval.ijbc import pool_meta

    embs = rng.normal(0, 1, (6, 8)).astype(np.float32)
    tids = np.array([3, 3, 9, 9, 9, 5])
    mids = np.array([0, 1, 2, 2, 3, 4])
    sids = np.array([70, 70, 71, 71, 71, 72])
    tpl, subj, uids = pool_meta(embs, tids, mids, sids)
    assert tpl.shape == (3, 8)
    assert uids.tolist() == [3, 5, 9]
    assert subj.tolist() == [70, 72, 71]
    np.testing.assert_allclose(np.linalg.norm(tpl, axis=-1), 1.0, atol=1e-5)


# ------------------------- torch import ------------------------------------


def _evolve_style_state_dict_from_twin(tm, use_se=False):
    """Rename our test twin's params to face.evoLVe conventions."""
    sd = {}
    sd["input_layer.0.weight"] = tm.inp[0].weight
    for suffix, val in (("weight", tm.inp[1].weight), ("bias", tm.inp[1].bias),
                        ("running_mean", tm.inp[1].running_mean),
                        ("running_var", tm.inp[1].running_var)):
        sd[f"input_layer.1.{suffix}"] = val
    sd["input_layer.2.weight"] = tm.inp[2].weight
    for i, b in enumerate(tm.blocks):
        p = f"body.{i}"
        for suffix, val in (("weight", b.bn0.weight), ("bias", b.bn0.bias),
                            ("running_mean", b.bn0.running_mean),
                            ("running_var", b.bn0.running_var)):
            sd[f"{p}.res_layer.0.{suffix}"] = val
        sd[f"{p}.res_layer.1.weight"] = b.conv1.weight
        sd[f"{p}.res_layer.2.weight"] = b.prelu.weight
        sd[f"{p}.res_layer.3.weight"] = b.conv2.weight
        for suffix, val in (("weight", b.bn2.weight), ("bias", b.bn2.bias),
                            ("running_mean", b.bn2.running_mean),
                            ("running_var", b.bn2.running_var)):
            sd[f"{p}.res_layer.4.{suffix}"] = val
        if use_se:
            sd[f"{p}.res_layer.5.fc1.weight"] = b.se_fc1.weight
            sd[f"{p}.res_layer.5.fc2.weight"] = b.se_fc2.weight
        if b.short is not None:
            sd[f"{p}.shortcut_layer.0.weight"] = b.short[0].weight
            for suffix, val in (("weight", b.short[1].weight),
                                ("bias", b.short[1].bias),
                                ("running_mean", b.short[1].running_mean),
                                ("running_var", b.short[1].running_var)):
                sd[f"{p}.shortcut_layer.1.{suffix}"] = val
    for suffix, val in (("weight", tm.out_bn.weight), ("bias", tm.out_bn.bias),
                        ("running_mean", tm.out_bn.running_mean),
                        ("running_var", tm.out_bn.running_var)):
        sd[f"output_layer.0.{suffix}"] = val
    sd["output_layer.3.weight"] = tm.out_fc.weight
    sd["output_layer.3.bias"] = tm.out_fc.bias
    for suffix, val in (("weight", tm.out_feat_bn.weight),
                        ("bias", tm.out_feat_bn.bias),
                        ("running_mean", tm.out_feat_bn.running_mean),
                        ("running_var", tm.out_feat_bn.running_var)):
        sd[f"output_layer.4.{suffix}"] = val
    return sd


def test_torch_import_roundtrip(rng):
    """torch twin → face.evoLVe state_dict → IRBackbone: outputs must match.

    NOTE the twin flattens NHWC-permuted (test_irse_parity), while a REAL
    face.evoLVe checkpoint flattens NCHW — that difference is exactly what
    _permute_flatten_linear corrects, so here we export the twin's linear in
    NCHW-flat order first.
    """
    import torch
    from tests.test_irse_parity import TorchIR
    from crfr.models.irse import IRBackbone
    from crfr.train.torch_import import load_face_evolve_state_dict

    stages = [(64, 2), (128, 2), (256, 2), (512, 2)]
    tm = TorchIR(stages)
    tm.eval()
    sd = _evolve_style_state_dict_from_twin(tm)
    # convert twin's NHWC-flat linear to the NCHW-flat convention the
    # importer expects (real checkpoints are NCHW-flat)
    w = sd["output_layer.3.weight"].detach().numpy()        # (512, 7*7*512)
    w4 = w.reshape(512, 7, 7, 512)                          # (O,H,W,C)
    sd["output_layer.3.weight"] = torch.from_numpy(
        np.transpose(w4, (0, 3, 1, 2)).reshape(512, -1).copy())

    jm = IRBackbone(depth="18", dtype=jnp.float32, rngs=nnx.Rngs(0))
    load_face_evolve_state_dict(jm, sd)

    x = rng.normal(0, 1, (2, 112, 112, 3)).astype(np.float32)
    jout = np.asarray(jm(jnp.asarray(x), train=False))
    with torch.no_grad():
        tout = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())).numpy()
    np.testing.assert_allclose(jout, tout, atol=2e-3, rtol=1e-3)


def test_export_import_inverse(rng):
    from crfr.models.irse import IRBackbone
    from crfr.train.torch_import import (export_face_evolve_state_dict,
                                         load_face_evolve_state_dict)

    m1 = IRBackbone(depth="18", dtype=jnp.float32, rngs=nnx.Rngs(1))
    sd = export_face_evolve_state_dict(m1)
    m2 = IRBackbone(depth="18", dtype=jnp.float32, rngs=nnx.Rngs(2))
    load_face_evolve_state_dict(m2, sd)
    x = jnp.asarray(rng.normal(0, 1, (2, 112, 112, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(m1(x)), np.asarray(m2(x)),
                               atol=1e-4)
