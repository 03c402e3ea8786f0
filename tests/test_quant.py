"""int8 PTQ serving path (models/quant.py): per-layer faithfulness, whole-
backbone embedding fidelity, verification-accuracy preservation on a
trained model, and the depthwise-stays-float rule."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

from crfr.models.irse import IRBackbone
from crfr.models.quant import (QuantConv, quantize_backbone,
                               quantized_embed_fn)


def test_quantconv_matches_float(rng):
    conv = nnx.Conv(16, 32, (3, 3), strides=2, padding=1, use_bias=False,
                    rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.normal(0, 1.0, (2, 16, 16, 16)), jnp.float32)
    q = QuantConv(conv, act_absmax=float(jnp.max(jnp.abs(x))))
    yf = np.asarray(conv(x))
    yq = np.asarray(q(x))
    assert yq.shape == yf.shape
    # s8 per-channel weights + s8 per-tensor activations: ~1% relative error
    rel = np.linalg.norm(yq - yf) / np.linalg.norm(yf)
    assert rel < 0.02, rel


def test_quantconv_stride_padding_bias(rng):
    """Config translation (stride/padding/bias) must match nnx.Conv exactly
    in shape and closely in value, including 1×1 SAME shortcut convs."""
    for kernel, stride, padding, bias in (((1, 1), 2, "SAME", False),
                                          ((3, 3), 1, 1, True),
                                          ((3, 3), 2, 1, False)):
        conv = nnx.Conv(8, 8, kernel, strides=stride, padding=padding,
                        use_bias=bias, rngs=nnx.Rngs(1))
        x = jnp.asarray(rng.normal(0, 1.0, (2, 12, 12, 8)), jnp.float32)
        q = QuantConv(conv, act_absmax=float(jnp.max(jnp.abs(x))))
        yf, yq = np.asarray(conv(x)), np.asarray(q(x))
        assert yq.shape == yf.shape, (kernel, stride, padding)
        rel = np.linalg.norm(yq - yf) / max(np.linalg.norm(yf), 1e-9)
        assert rel < 0.02, (kernel, stride, padding, rel)


def test_quantized_backbone_embedding_fidelity(rng):
    bb = IRBackbone(depth="18", input_size=32, dropout=0.0,
                    dtype=jnp.float32, rngs=nnx.Rngs(0))
    calib = [rng.normal(0, 0.7, (8, 32, 32, 3)).astype(np.float32)
             for _ in range(2)]
    f = quantized_embed_fn(bb, calib)
    x = jnp.asarray(rng.normal(0, 0.7, (4, 32, 32, 3)), jnp.float32)
    ef = np.asarray(bb(x, train=False))
    eq = np.asarray(f(x))
    cos = (ef * eq).sum(-1) / (np.linalg.norm(ef, axis=-1)
                               * np.linalg.norm(eq, axis=-1))
    assert cos.min() > 0.995, cos


@pytest.mark.slow
def test_quantized_trained_model_keeps_accuracy(trained_session):
    """The serving claim that matters: int8 embeddings run the SAME
    verification protocol to (near-)identical accuracy on a trained
    model. (slow tier: ~3 min of distinct whole-model quant compiles; the
    fast tier keeps per-layer faithfulness + backbone cosine fidelity.)"""
    from crfr.eval import evaluate_verification
    from crfr.ops.normalize import normalize

    cfg, data, tr, _ = trained_session
    rng = np.random.default_rng(5)
    i1, i2, issame = data.eval_pairs(rng, 32)
    x1 = normalize(jnp.asarray(i1, jnp.float32))
    x2 = normalize(jnp.asarray(i2, jnp.float32))

    backbone = tr.model.backbone
    fq = quantized_embed_fn(backbone, [np.asarray(x1[:16])])

    ef1 = np.asarray(backbone(x1, train=False))
    ef2 = np.asarray(backbone(x2, train=False))
    eq1, eq2 = np.asarray(fq(x1)), np.asarray(fq(x2))

    accf = evaluate_verification(ef1, ef2, issame, n_folds=2).accuracy_mean
    accq = evaluate_verification(eq1, eq2, issame, n_folds=2).accuracy_mean
    assert accq >= accf - 0.05, (accf, accq)
    # embeddings themselves stay aligned, not just the protocol outcome
    cos = (ef1 * eq1).sum(-1) / (np.linalg.norm(ef1, axis=-1)
                                 * np.linalg.norm(eq1, axis=-1)).clip(1e-12)
    assert cos.min() > 0.98, cos.min()


@pytest.mark.slow
def test_cli_extract_int8_matches_float(tmp_path, cli_ckpt, rng, capsys):
    """`crfr extract --int8` (the serving CLI plumbing around
    _backbone_apply: calibration on the run's own inputs with the SAME
    degrade front end the extract uses) produces embeddings aligned with
    the float path. (slow tier: XLA:CPU s8 convs are ~4 min of
    compile+run; the module-level quant tests cover the fast tier.)"""
    import json as _json

    from PIL import Image

    from crfr.cli import main

    ckpt, _ = cli_ckpt
    lines = []
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(16):
        p = d / f"{i}.jpg"
        Image.fromarray(rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
                        ).save(p)
        lines.append(f"{p} {i % 4}")
    (tmp_path / "list.txt").write_text("\n".join(lines))

    def run(out, *flags):
        rc = main(["extract", "--ckpt", ckpt,
                   "--list", str(tmp_path / "list.txt"),
                   "--out", str(tmp_path / out), *flags])
        assert rc == 0
        return _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    run("f.npy")
    run("q.npy", "--int8")
    ef = np.load(tmp_path / "f.npy")
    eq = np.load(tmp_path / "q.npy")
    cos = (ef * eq).sum(-1) / (np.linalg.norm(ef, axis=-1)
                               * np.linalg.norm(eq, axis=-1)).clip(1e-12)
    assert cos.min() > 0.98, cos.min()


def test_depthwise_convs_stay_float(rng):
    """MobileFaceNet's depthwise convs (bandwidth-bound, no MXU win) must
    NOT be quantized; pointwise/dense convs must."""
    from crfr.models.mobilefacenet import MobileFaceNet

    m = MobileFaceNet(input_size=32, dtype=jnp.float32, rngs=nnx.Rngs(0))
    calib = [rng.normal(0, 0.7, (4, 32, 32, 3)).astype(np.float32)]
    qm = quantize_backbone(m, calib)
    kinds = {"quant": 0, "float_grouped": 0}
    for _, node in nnx.iter_graph(qm):
        if isinstance(node, QuantConv):
            kinds["quant"] += 1
        elif isinstance(node, nnx.Conv) and node.feature_group_count > 1:
            kinds["float_grouped"] += 1
    assert kinds["quant"] > 0 and kinds["float_grouped"] > 0, kinds
    # and it still runs
    out = qm(jnp.asarray(calib[0]), train=False)
    assert out.shape == (4, 512)


def test_quantized_export_roundtrip(tmp_path, rng):
    """int8 backbone goes through the AOT serving exporter (serve.py) and
    the loaded artifact reproduces the live quantized embeddings."""
    from crfr.serve import build_serving_fn
    import jax.export as jexport

    bb = IRBackbone(depth="18", input_size=32, dropout=0.0,
                    dtype=jnp.float32, rngs=nnx.Rngs(0))
    calib = [rng.normal(0, 0.7, (8, 32, 32, 3)).astype(np.float32)]
    qbb = quantize_backbone(bb, calib)
    graphdef, state = nnx.split(qbb)
    fn = build_serving_fn(
        lambda x: nnx.merge(graphdef, state)(x, train=False),
        image_size=32)
    spec = jax.ShapeDtypeStruct((4, 32, 32, 3), jnp.uint8)
    exported = jexport.export(jax.jit(fn))(spec)
    blob = exported.serialize()
    re = jexport.deserialize(blob)
    x = rng.integers(0, 256, (4, 32, 32, 3)).astype(np.uint8)
    a = np.asarray(re.call(x))
    b = np.asarray(fn(jnp.asarray(x)))
    # NOT bitwise: the deserialized StableHLO and the live jit may fuse
    # differently; 1-ulp float changes flip int8 rounding at exact .5
    # boundaries and amplify over the conv stack. Functional equality is
    # embedding-direction equality.
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                             * np.linalg.norm(b, axis=-1)).clip(1e-12)
    assert a.shape == b.shape and cos.min() > 0.999, cos
