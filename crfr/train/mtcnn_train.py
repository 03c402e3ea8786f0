"""MTCNN cascade training on synthetic rendered faces (SURVEY.md §1 L1).

The sandbox has no network, so the canonical pretrained MTCNN weights are
unobtainable (crfr/models/mtcnn.py docstring). This module makes detection
work END-TO-END anyway: faces are RENDERED procedurally with boxes and all
5 landmarks known by construction, and P/R/ONet train briefly on crops
sampled from those scenes — the full `FaceRecognizer.detect_and_align` →
embed pipeline then runs on images the system has never seen. Real-world
weights can still be imported via ``MTCNN.load_torch_weights``; this is the
no-download path that proves the cascade.

Targets follow the canonical MTCNN conventions the host-side decode expects
(crfr/models/mtcnn.py): bbox regression deltas normalized by the crop side
(applied as ``x1 += dx1·w``), landmarks normalized to the crop box.

TPU notes: each net trains as one donated-state jitted step on fixed-size
crop batches (12/24/48 px) — three tiny static programs; scene rendering and
IoU crop sampling are cheap NumPy on host.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from crfr.models.mtcnn import MTCNN, crop_resize


# ---------------------------------------------------------------------------
# Procedural face renderer — geometry known by construction
# ---------------------------------------------------------------------------

# Canonical landmark layout in box-relative coords (eyes, nose, mouth pair) —
# deliberately close to the 112×112 alignment template's proportions.
_LMK_REL = np.asarray([
    [0.315, 0.46], [0.685, 0.46],      # eyes
    [0.50, 0.64],                      # nose tip
    [0.35, 0.82], [0.65, 0.82],        # mouth corners
], np.float32)


def render_face(rng: np.random.Generator, s: int
                ) -> tuple[np.ndarray, np.ndarray]:
    """→ (face crop (s, s, 3) float32 [0,255], landmarks (5, 2) crop coords).

    An ellipse "skin" patch, dark elliptical eyes, a nose wedge and a mouth
    bar — enough structure that a convnet separates faces from background
    and regresses the landmark geometry."""
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
    skin = np.asarray([198, 160, 122], np.float32) + rng.normal(0, 12, 3)
    img = np.zeros((s, s, 3), np.float32)
    # head ellipse
    cx, cy, rx, ry = 0.5, 0.52, 0.42, 0.48
    head = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0
    img[head] = skin * rng.uniform(0.9, 1.1)
    # landmark jitter (shared per face: the whole constellation shifts a bit)
    lmk = (_LMK_REL + rng.normal(0, 0.012, _LMK_REL.shape)).astype(np.float32)
    # eyes: dark ellipses
    for ex, ey in lmk[:2]:
        m = ((xx - ex) / 0.075) ** 2 + ((yy - ey) / 0.045) ** 2 <= 1.0
        img[m] = rng.uniform(15, 60)
    # nose: brighter wedge below the tip
    nx, ny = lmk[2]
    m = (np.abs(xx - nx) <= (yy - (ny - 0.16)) * 0.28) & (yy <= ny) & \
        (yy >= ny - 0.16)
    img[m] = skin * 1.12
    # mouth: dark red bar between the corners
    (mx1, my1), (mx2, my2) = lmk[3], lmk[4]
    m = (xx >= mx1) & (xx <= mx2) & (np.abs(yy - 0.5 * (my1 + my2)) <= 0.035)
    img[m] = np.asarray([150, 50, 50], np.float32) * rng.uniform(0.8, 1.2)
    img += rng.normal(0, 6, img.shape)
    return np.clip(img, 0, 255), lmk * s


def _smooth_background(rng: np.random.Generator, size: int) -> np.ndarray:
    coarse = rng.uniform(0, 255, (6, 6, 3))
    ys = np.linspace(0, 5, size)
    y0 = np.floor(ys).astype(int).clip(0, 4)
    fy = (ys - y0)
    a = coarse[y0] * (1 - fy)[:, None, None] + coarse[y0 + 1] * fy[:, None, None]
    b = a[:, y0] * (1 - fy)[None, :, None] + a[:, y0 + 1] * fy[None, :, None]
    return b.astype(np.float32)


@dataclass
class Scene:
    image: np.ndarray          # (H, W, 3) float32 [0,255]
    box: np.ndarray            # (4,) x1 y1 x2 y2
    landmarks: np.ndarray      # (5, 2) absolute coords


def render_scene(rng: np.random.Generator, size: int = 160,
                 face_range: tuple[int, int] = (48, 112)) -> Scene:
    img = _smooth_background(rng, size)
    s = int(rng.integers(*face_range))
    x1 = int(rng.integers(0, size - s + 1))
    y1 = int(rng.integers(0, size - s + 1))
    face, lmk = render_face(rng, s)
    # blend only inside the head ellipse so the box edge isn't a rectangle cue
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
    mask = (((xx - 0.5) / 0.46) ** 2 + ((yy - 0.52) / 0.5) ** 2 <= 1.0
            )[..., None].astype(np.float32)
    img[y1:y1 + s, x1:x1 + s] = (mask * face
                                 + (1 - mask) * img[y1:y1 + s, x1:x1 + s])
    return Scene(img, np.asarray([x1, y1, x1 + s, y1 + s], np.float32),
                 lmk + np.asarray([x1, y1], np.float32))


def iou(a: np.ndarray, b: np.ndarray) -> float:
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ar_a = (a[2] - a[0]) * (a[3] - a[1])
    ar_b = (b[2] - b[0]) * (b[3] - b[1])
    return float(inter / max(ar_a + ar_b - inter, 1e-9))


def sample_crops(rng: np.random.Generator, scene: Scene, out_size: int,
                 n_pos: int, n_neg: int):
    """IoU-sampled training crops from one scene.

    → (crops (n,out,out,3), cls (n,), reg (n,4), lmk (n,10)); reg/lmk are
    zero for negatives (masked out of the loss)."""
    g = scene.box
    gs = g[2] - g[0]
    size = scene.image.shape[0]
    boxes, cls = [], []
    tries = 0
    # EXACTLY n_pos positives (fallback: the GT box itself, a perfect
    # positive) and n_neg negatives — fixed batch shapes, no recompiles.
    while sum(cls) < n_pos:
        tries += 1
        if tries > n_pos * 30:
            boxes.append(g.copy())
            cls.append(1)
            continue
        side = gs * rng.uniform(0.85, 1.2)
        cx = 0.5 * (g[0] + g[2]) + rng.uniform(-0.15, 0.15) * gs
        cy = 0.5 * (g[1] + g[3]) + rng.uniform(-0.15, 0.15) * gs
        b = np.asarray([cx - side / 2, cy - side / 2,
                        cx + side / 2, cy + side / 2], np.float32)
        if iou(b, g) >= 0.6:
            boxes.append(b)
            cls.append(1)
    n_have_pos = len(boxes)
    tries = 0
    while (len(boxes) - n_have_pos) < n_neg:
        tries += 1
        side = rng.uniform(12, size * 0.8)
        x1 = rng.uniform(0, size - side)
        y1 = rng.uniform(0, size - side)
        b = np.asarray([x1, y1, x1 + side, y1 + side], np.float32)
        if iou(b, g) < 0.25 or tries > n_neg * 30:
            boxes.append(b)
            cls.append(0)
    boxes = np.asarray(boxes, np.float32)
    cls = np.asarray(cls, np.float32)
    crops = crop_resize(scene.image, boxes, out_size)
    side = boxes[:, 2] - boxes[:, 0]
    reg = np.stack([(g[0] - boxes[:, 0]) / side,
                    (g[1] - boxes[:, 1]) / side,
                    (g[2] - boxes[:, 2]) / side,
                    (g[3] - boxes[:, 3]) / side], 1).astype(np.float32)
    lmk = np.concatenate([
        (scene.landmarks[None, :, 0] - boxes[:, 0:1]) / side[:, None],
        (scene.landmarks[None, :, 1] - boxes[:, 1:2]) / side[:, None],
    ], 1).astype(np.float32)                      # (n, 10) = x1..x5, y1..y5
    neg = cls == 0
    reg[neg] = 0
    lmk[neg] = 0
    return crops, cls, reg, lmk


# ---------------------------------------------------------------------------
# Per-net training
# ---------------------------------------------------------------------------


def _make_step(graphdef, tx, with_lmk: bool):
    @partial(jax.jit, donate_argnums=(0, 1))
    def step(state, opt_state, x, cls_t, reg_t, lmk_t):
        net = nnx.merge(graphdef, state)

        def loss_fn(net):
            out = net(x)
            prob, reg = out[0], out[1]
            prob = prob.reshape(-1)
            reg = reg.reshape(reg.shape[0], -1)
            eps = 1e-6
            ce = -jnp.mean(cls_t * jnp.log(prob + eps)
                           + (1 - cls_t) * jnp.log(1 - prob + eps))
            pos = cls_t[:, None]
            n_pos = jnp.maximum(jnp.sum(cls_t), 1.0)
            l_reg = jnp.sum(pos * jnp.square(reg - reg_t)) / n_pos
            loss = ce + 0.5 * l_reg
            if with_lmk:
                lmk = out[2]
                loss = loss + 0.5 * (jnp.sum(pos * jnp.square(lmk - lmk_t))
                                     / n_pos)
            return loss

        loss, grads = nnx.value_and_grad(loss_fn)(net)
        params = nnx.state(net, nnx.Param)
        updates, opt_state = tx.update(grads, opt_state, params)
        nnx.update(net, jax.tree_util.tree_map(jnp.add, params, updates))
        _, state = nnx.split(net)
        return state, opt_state, loss

    return step


def _norm(x: np.ndarray) -> jnp.ndarray:
    return jnp.asarray((x - 127.5) * (1.0 / 128.0), jnp.float32)


def train_mtcnn_synthetic(mtcnn: MTCNN, steps: int = 250, batch_scenes: int = 8,
                          lr: float = 2e-3, seed: int = 0,
                          scene_size: int = 160) -> dict[str, float]:
    """Train the P/R/ONet cascade on procedurally rendered faces.

    One scene batch feeds all three nets per step (shared rendering cost:
    the same crops at 12/24/48 px). Returns final losses per net."""
    rng = np.random.default_rng(seed)
    nets = {"p": mtcnn.pnet, "r": mtcnn.rnet, "o": mtcnn.onet}
    sizes = {"p": 12, "r": 24, "o": 48}
    txs = {k: optax.adam(lr) for k in nets}
    graphs, states, opts, steps_fn = {}, {}, {}, {}
    for k, net in nets.items():
        graphs[k], states[k] = nnx.split(net)
        opts[k] = txs[k].init(nnx.state(net, nnx.Param))
        steps_fn[k] = _make_step(graphs[k], txs[k], with_lmk=(k == "o"))

    losses = {k: float("nan") for k in nets}
    for _ in range(steps):
        scenes = [render_scene(rng, scene_size) for _ in range(batch_scenes)]
        batches = {k: [] for k in nets}
        for sc in scenes:
            base = sample_crops(rng, sc, sizes["o"], n_pos=3, n_neg=3)
            # re-crop the same boxes at each net's input size by rescaling
            # the 48px crops is lossy; sample independently per net instead
            for k in nets:
                if k == "o":
                    batches[k].append(base)
                else:
                    batches[k].append(
                        sample_crops(rng, sc, sizes[k], n_pos=3, n_neg=3))
        for k in nets:
            xs = np.concatenate([b[0] for b in batches[k]])
            cl = np.concatenate([b[1] for b in batches[k]])
            rg = np.concatenate([b[2] for b in batches[k]])
            lm = np.concatenate([b[3] for b in batches[k]])
            states[k], opts[k], l = steps_fn[k](
                states[k], opts[k], _norm(xs), jnp.asarray(cl),
                jnp.asarray(rg), jnp.asarray(lm))
            losses[k] = float(jax.device_get(l))
    # write the trained states back into the cascade's live modules
    for k, net in nets.items():
        nnx.update(net, states[k])
    return {f"{k}_loss": v for k, v in losses.items()}
