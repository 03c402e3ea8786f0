"""MTCNN face detector — PNet/RNet/ONet cascade (SURVEY.md §1 L1: the
reference family's ``align/`` stage runs MTCNN 5-point detection before the
similarity-transform crop).

Capability note: this sandbox has no network access, so no pretrained MTCNN
weights exist here; the nets initialize randomly and the cascade is
end-to-end functional but needs real weights to detect real faces. Weights
import from the standard torch MTCNN layout via ``load_torch_weights``
(facenet-pytorch/face.evoLVe conventions); tests exercise the full cascade
machinery (pyramids, dense PNet decode, NMS, crop batching) with synthetic
logits, and architecture shapes match the canonical MTCNN exactly.

TPU-first split: the three nets are static-shape NNX modules — PNet compiles
once per pyramid level (≤ ~10 static shapes), R/ONet take fixed-size padded
crop batches. The irregular parts (box decode, NMS, pyramid bookkeeping) are
tiny and stay in NumPy on host, where dynamic shapes are free.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from crfr.models.irse import PReLU


class _MaxPool:
    def __init__(self, size, stride, ceil: bool = True):
        self.size = size
        self.stride = stride
        self.ceil = ceil

    def __call__(self, x):
        if self.ceil:
            b, h, w, c = x.shape
            pad_h = (-(h - self.size) % self.stride) % self.stride
            pad_w = (-(w - self.size) % self.stride) % self.stride
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                            constant_values=-jnp.inf)
        return nnx.max_pool(x, (self.size, self.size),
                            strides=(self.stride, self.stride))


class PNet(nnx.Module):
    """Fully-convolutional proposal net; stride 2, receptive field 12."""

    def __init__(self, *, rngs: nnx.Rngs):
        k = dict(rngs=rngs, padding="VALID")
        self.conv1 = nnx.Conv(3, 10, (3, 3), **k)
        self.prelu1 = PReLU(10)
        self.pool = _MaxPool(2, 2)
        self.conv2 = nnx.Conv(10, 16, (3, 3), **k)
        self.prelu2 = PReLU(16)
        self.conv3 = nnx.Conv(16, 32, (3, 3), **k)
        self.prelu3 = PReLU(32)
        self.cls = nnx.Conv(32, 2, (1, 1), rngs=rngs)
        self.reg = nnx.Conv(32, 4, (1, 1), rngs=rngs)

    def __call__(self, x):
        x = self.prelu1(self.conv1(x))
        x = self.pool(x)
        x = self.prelu2(self.conv2(x))
        x = self.prelu3(self.conv3(x))
        prob = jax.nn.softmax(self.cls(x), axis=-1)[..., 1]
        return prob, self.reg(x)


class RNet(nnx.Module):
    """Refinement net on 24×24 crops."""

    def __init__(self, *, rngs: nnx.Rngs):
        k = dict(rngs=rngs, padding="VALID")
        self.conv1 = nnx.Conv(3, 28, (3, 3), **k)
        self.prelu1 = PReLU(28)
        self.pool1 = _MaxPool(3, 2)
        self.conv2 = nnx.Conv(28, 48, (3, 3), **k)
        self.prelu2 = PReLU(48)
        self.pool2 = _MaxPool(3, 2)
        self.conv3 = nnx.Conv(48, 64, (2, 2), **k)
        self.prelu3 = PReLU(64)
        self.fc = nnx.Linear(3 * 3 * 64, 128, rngs=rngs)
        self.prelu4 = PReLU(128)
        self.cls = nnx.Linear(128, 2, rngs=rngs)
        self.reg = nnx.Linear(128, 4, rngs=rngs)

    def __call__(self, x):
        x = self.pool1(self.prelu1(self.conv1(x)))
        x = self.pool2(self.prelu2(self.conv2(x)))
        x = self.prelu3(self.conv3(x))
        x = x.reshape(x.shape[0], -1)
        x = self.prelu4(self.fc(x))
        return jax.nn.softmax(self.cls(x), -1)[:, 1], self.reg(x)


class ONet(nnx.Module):
    """Output net on 48×48 crops; adds 5-point landmarks."""

    def __init__(self, *, rngs: nnx.Rngs):
        k = dict(rngs=rngs, padding="VALID")
        self.conv1 = nnx.Conv(3, 32, (3, 3), **k)
        self.prelu1 = PReLU(32)
        self.pool1 = _MaxPool(3, 2)
        self.conv2 = nnx.Conv(32, 64, (3, 3), **k)
        self.prelu2 = PReLU(64)
        self.pool2 = _MaxPool(3, 2)
        self.conv3 = nnx.Conv(64, 64, (3, 3), **k)
        self.prelu3 = PReLU(64)
        self.pool3 = _MaxPool(2, 2)
        self.conv4 = nnx.Conv(64, 128, (2, 2), **k)
        self.prelu4 = PReLU(128)
        self.fc = nnx.Linear(3 * 3 * 128, 256, rngs=rngs)
        self.prelu5 = PReLU(256)
        self.cls = nnx.Linear(256, 2, rngs=rngs)
        self.reg = nnx.Linear(256, 4, rngs=rngs)
        self.lmk = nnx.Linear(256, 10, rngs=rngs)

    def __call__(self, x):
        x = self.pool1(self.prelu1(self.conv1(x)))
        x = self.pool2(self.prelu2(self.conv2(x)))
        x = self.pool3(self.prelu3(self.conv3(x)))
        x = self.prelu4(self.conv4(x))
        x = x.reshape(x.shape[0], -1)
        x = self.prelu5(self.fc(x))
        return (jax.nn.softmax(self.cls(x), -1)[:, 1], self.reg(x),
                self.lmk(x))


# ---------------------------------------------------------------------------
# Host-side cascade machinery
# ---------------------------------------------------------------------------


def nms(boxes: np.ndarray, scores: np.ndarray, thresh: float,
        method: str = "union") -> np.ndarray:
    """Greedy NMS; boxes (N, 4) [x1 y1 x2 y2]. Returns kept indices."""
    if len(boxes) == 0:
        return np.zeros(0, np.int64)
    x1, y1, x2, y2 = boxes.T
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.argsort(scores)[::-1]
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = (np.maximum(0.0, xx2 - xx1 + 1)
                 * np.maximum(0.0, yy2 - yy1 + 1))
        if method == "min":
            o = inter / np.minimum(area[i], area[order[1:]])
        else:
            o = inter / (area[i] + area[order[1:]] - inter)
        order = order[1:][o <= thresh]
    return np.asarray(keep, np.int64)


def decode_pnet(prob: np.ndarray, reg: np.ndarray, scale: float,
                thresh: float) -> np.ndarray:
    """Dense PNet map → candidate boxes (N, 9): x1 y1 x2 y2 score reg4.
    Stride 2, cell size 12 (canonical MTCNN decode)."""
    stride, cell = 2, 12
    ys, xs = np.where(prob >= thresh)
    if len(ys) == 0:
        return np.zeros((0, 9), np.float32)
    scores = prob[ys, xs]
    regs = reg[ys, xs]
    x1 = np.round(stride * xs / scale)
    y1 = np.round(stride * ys / scale)
    x2 = np.round((stride * xs + cell) / scale)
    y2 = np.round((stride * ys + cell) / scale)
    return np.concatenate([
        np.stack([x1, y1, x2, y2, scores], 1), regs], 1).astype(np.float32)


def apply_regression(boxes: np.ndarray) -> np.ndarray:
    """Apply bbox regression deltas (cols 5:9) to boxes (cols 0:4)."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    out = boxes[:, :5].copy()
    out[:, 0] += boxes[:, 5] * w
    out[:, 1] += boxes[:, 6] * h
    out[:, 2] += boxes[:, 7] * w
    out[:, 3] += boxes[:, 8] * h
    return out


def square_boxes(boxes: np.ndarray) -> np.ndarray:
    out = boxes.copy()
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    side = np.maximum(w, h)
    out[:, 0] += w * 0.5 - side * 0.5
    out[:, 1] += h * 0.5 - side * 0.5
    out[:, 2] = out[:, 0] + side
    out[:, 3] = out[:, 1] + side
    return out


def crop_resize(img: np.ndarray, boxes: np.ndarray, size: int) -> np.ndarray:
    """Crop boxes (zero-padded out of bounds) and bicubic-resize to size."""
    from crfr import native

    h, w = img.shape[:2]
    out = np.zeros((len(boxes), size, size, 3), np.float32)
    for i, (x1, y1, x2, y2) in enumerate(boxes[:, :4].astype(int)):
        cw, ch = x2 - x1, y2 - y1
        if cw <= 0 or ch <= 0:
            continue
        crop = np.zeros((ch, cw, 3), np.float32)
        sx1, sy1 = max(x1, 0), max(y1, 0)
        sx2, sy2 = min(x2, w), min(y2, h)
        if sx2 > sx1 and sy2 > sy1:
            crop[sy1 - y1:sy2 - y1, sx1 - x1:sx2 - x1] = img[sy1:sy2, sx1:sx2]
        if native.available():
            out[i] = native.resize_bicubic(crop, (size, size), "pil")
        else:
            from PIL import Image
            im = Image.fromarray(np.clip(crop, 0, 255).astype(np.uint8))
            out[i] = np.asarray(im.resize((size, size), Image.BICUBIC),
                                np.float32)
    return out


@dataclass
class Detection:
    boxes: np.ndarray          # (N, 4) x1 y1 x2 y2
    scores: np.ndarray         # (N,)
    landmarks: np.ndarray      # (N, 5, 2) absolute image coords


class MTCNN:
    """Full cascade. Nets are jitted; crop batches are padded to the next
    power of two so each stage compiles for only a few static shapes."""

    def __init__(self, min_face: int = 20, scale_factor: float = 0.709,
                 thresholds=(0.6, 0.7, 0.7), seed: int = 0):
        self.min_face = min_face
        self.scale_factor = scale_factor
        self.thresholds = thresholds
        self.pnet = PNet(rngs=nnx.Rngs(seed))
        self.rnet = RNet(rngs=nnx.Rngs(seed + 1))
        self.onet = ONet(rngs=nnx.Rngs(seed + 2))
        self._pnet_fn = nnx.jit(lambda m, x: m(x))
        self._rnet_fn = nnx.jit(lambda m, x: m(x))
        self._onet_fn = nnx.jit(lambda m, x: m(x))

    @staticmethod
    def _norm(x: np.ndarray) -> jnp.ndarray:
        return jnp.asarray((x - 127.5) * (1.0 / 128.0), jnp.float32)

    @staticmethod
    def _pad_pow2(x: np.ndarray, cap: int = 512):
        n = len(x)
        m = 1
        while m < n:
            m *= 2
        m = min(m, max(cap, 1))
        if m > n:
            x = np.concatenate([x, np.zeros((m - n,) + x.shape[1:],
                                            x.dtype)])
        return x, n

    def _pyramid_scales(self, h: int, w: int):
        scale = 12.0 / self.min_face
        minl = min(h, w) * scale
        scales = []
        while minl >= 12:
            scales.append(scale)
            scale *= self.scale_factor
            minl *= self.scale_factor
        return scales

    def detect(self, img: np.ndarray) -> Detection:
        """img (H, W, 3) uint8/float RGB → Detection (host-side cascade)."""
        img = np.asarray(img, np.float32)
        h, w = img.shape[:2]
        t1, t2, t3 = self.thresholds

        # Stage 1: PNet over the pyramid
        cands = []
        for s in self._pyramid_scales(h, w):
            sh, sw = int(np.ceil(h * s)), int(np.ceil(w * s))
            if min(sh, sw) < 12:
                continue
            from crfr import native
            if native.available():
                scaled = native.resize_bicubic(img, (sh, sw), "pil")
            else:
                from PIL import Image
                scaled = np.asarray(Image.fromarray(
                    np.clip(img, 0, 255).astype(np.uint8)).resize(
                        (sw, sh), Image.BICUBIC), np.float32)
            prob, reg = self._pnet_fn(self.pnet, self._norm(scaled)[None])
            b = decode_pnet(np.asarray(prob)[0], np.asarray(reg)[0], s, t1)
            if len(b):
                b = b[nms(b[:, :4], b[:, 4], 0.5)]
                cands.append(b)
        if not cands:
            return Detection(np.zeros((0, 4)), np.zeros(0),
                             np.zeros((0, 5, 2)))
        boxes = np.concatenate(cands)
        boxes = boxes[nms(boxes[:, :4], boxes[:, 4], 0.7)]
        boxes = square_boxes(apply_regression(boxes))

        # Stage 2: RNet
        crops = crop_resize(img, boxes, 24)
        crops_p, n = self._pad_pow2(crops)
        prob, reg = self._rnet_fn(self.rnet, self._norm(crops_p))
        prob = np.asarray(prob)[:n]
        reg = np.asarray(reg)[:n]
        keep = prob >= t2
        boxes = np.concatenate([boxes[keep, :4], prob[keep, None],
                                reg[keep]], 1)
        if len(boxes) == 0:
            return Detection(np.zeros((0, 4)), np.zeros(0),
                             np.zeros((0, 5, 2)))
        boxes = boxes[nms(boxes[:, :4], boxes[:, 4], 0.7)]
        boxes = square_boxes(apply_regression(boxes))

        # Stage 3: ONet
        crops = crop_resize(img, boxes, 48)
        crops_p, n = self._pad_pow2(crops)
        prob, reg, lmk = self._onet_fn(self.onet, self._norm(crops_p))
        prob = np.asarray(prob)[:n]
        reg = np.asarray(reg)[:n]
        lmk = np.asarray(lmk)[:n]
        keep = prob >= t3
        boxes4 = boxes[keep, :4]
        prob = prob[keep]
        reg = reg[keep]
        lmk = lmk[keep]
        bw = boxes4[:, 2] - boxes4[:, 0]
        bh = boxes4[:, 3] - boxes4[:, 1]
        # landmarks: 10 = (x1..x5, y1..y5) relative to box
        lx = boxes4[:, 0:1] + lmk[:, 0:5] * bw[:, None]
        ly = boxes4[:, 1:2] + lmk[:, 5:10] * bh[:, None]
        lms = np.stack([lx, ly], axis=-1)
        final = np.concatenate([boxes4, prob[:, None], reg], 1)
        final = apply_regression(final)
        keep2 = nms(final[:, :4], final[:, 4], 0.7, method="min")
        return Detection(final[keep2, :4], final[keep2, 4], lms[keep2])

    # -- torch weight import ------------------------------------------------
    def load_torch_weights(self, pnet_sd=None, rnet_sd=None, onet_sd=None):
        """Import standard torch MTCNN state_dicts (facenet-pytorch naming:
        conv1..4, prelu1..5, dense4/5/6 or conv4-1/4-2 style heads).
        Accepts any dict whose tensors match our shapes in definition order."""
        for net, sd in ((self.pnet, pnet_sd), (self.rnet, rnet_sd),
                        (self.onet, onet_sd)):
            if sd is None:
                continue
            _load_by_order(net, sd)


def _load_by_order(net: nnx.Module, sd) -> None:
    """Shape-matched in-order import: torch params are consumed in their
    state_dict order onto our params in definition order."""
    tensors = [np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
               for v in sd.values()]
    idx = 0

    def walk(m):
        # vars() preserves DEFINITION order (nnx.iter_graph doesn't), which
        # must mirror the torch state_dict's insertion order.
        for v in vars(m).values():
            if isinstance(v, (nnx.Conv, nnx.Linear, PReLU)):
                yield v
            elif isinstance(v, nnx.Module):
                yield from walk(v)

    for mod in walk(net):
        if isinstance(mod, nnx.Conv):
            t = tensors[idx]; idx += 1
            mod.kernel.value = jnp.asarray(np.transpose(t, (2, 3, 1, 0)))
            if mod.bias is not None:
                mod.bias.value = jnp.asarray(tensors[idx]); idx += 1
        elif isinstance(mod, nnx.Linear):
            t = tensors[idx]; idx += 1
            mod.kernel.value = jnp.asarray(t.T)
            if mod.bias is not None:
                mod.bias.value = jnp.asarray(tensors[idx]); idx += 1
        elif isinstance(mod, PReLU):
            mod.alpha.value = jnp.asarray(tensors[idx]); idx += 1
