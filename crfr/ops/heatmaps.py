"""Prior targets for the hallucination stage (SURVEY.md §2.1 "Prior
estimator"): landmark heatmaps AND face-parsing maps, FSRNet-style.

Given 5-point landmarks (from dataset annotations or the MTCNN cascade):

- ``landmark_heatmaps`` renders one unit-peak Gaussian per landmark;
- ``parsing_maps`` renders 11 soft face-parsing channels (skin, brows,
  eyes, nose, lips, inner mouth, hair, background — the Helen-label set
  FSRNet supervises with) as geometric soft-ellipse masks in a
  face-aligned frame (rotated by the eye line), so every prior channel
  has a target even when no pixel-level parsing annotations exist. When a
  dataset DOES ship parsing masks, pass them directly to
  losses.gan.prior_loss — these generators are the annotation-free path.
- ``prior_targets`` concatenates both: (..., S, S, 5 + 11 = 16), matching
  the PriorEstimator's default 16 channels.

Pure jnp, static shapes; vmapped over the batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("size", "sigma"))
def landmark_heatmaps(landmarks: jax.Array, size: int = 112,
                      sigma: float = 3.0) -> jax.Array:
    """landmarks (..., K, 2) in pixel coords → (..., size, size, K) heatmaps
    with a unit-peak Gaussian at each landmark."""
    xs = jnp.arange(size, dtype=jnp.float32)
    ys = jnp.arange(size, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)                        # (S, S)

    def one(lm):                                         # (K, 2) → (S, S, K)
        dx = gx[None] - lm[:, 0][:, None, None]          # (K, S, S)
        dy = gy[None] - lm[:, 1][:, None, None]
        h = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
        return jnp.transpose(h, (1, 2, 0))

    batch_shape = landmarks.shape[:-2]
    flat = landmarks.reshape((-1,) + landmarks.shape[-2:]).astype(jnp.float32)
    out = jax.vmap(one)(flat)
    return out.reshape(batch_shape + (size, size, landmarks.shape[-2]))


# ---------------------------------------------------------------------------
# Face-parsing maps from 5 landmarks
# ---------------------------------------------------------------------------

# (anchor, dx, dy, rx, ry) per parsing channel, all in eye-distance units
# in the face-aligned frame (proportions calibrated on the canonical
# 112×112 5-point template, ops/similarity.py). Anchors: 0..4 = the 5
# landmarks (le, re, nose, lmouth, rmouth), 5 = mouth midpoint.
_PARSE_SPECS = (
    ("skin",    2, 0.0, -0.25, 1.10, 0.95),
    ("l_brow",  0, 0.0, -0.25, 0.30, 0.10),
    ("r_brow",  1, 0.0, -0.25, 0.30, 0.10),
    ("l_eye",   0, 0.0,  0.00, 0.25, 0.12),
    ("r_eye",   1, 0.0,  0.00, 0.25, 0.12),
    ("nose",    2, 0.0, -0.05, 0.22, 0.35),
    ("u_lip",   5, 0.0, -0.06, 0.50, 0.08),
    ("l_lip",   5, 0.0,  0.10, 0.50, 0.10),
    ("mouth",   5, 0.0,  0.02, 0.42, 0.06),
)
_HAIR_SPEC = (2, 0.0, -1.30, 1.05, 0.50)     # band above the hairline
PARSING_LABELS = tuple(s[0] for s in _PARSE_SPECS) + ("hair", "background")


@partial(jax.jit, static_argnames=("size", "sharpness"))
def parsing_maps(landmarks: jax.Array, size: int = 112,
                 sharpness: float = 8.0) -> jax.Array:
    """landmarks (..., 5, 2) pixel coords → (..., size, size, 11) soft
    face-parsing maps in [0, 1] (see PARSING_LABELS for channel order).

    Regions are soft ellipses placed relative to the landmarks in a frame
    rotated by the eye-line angle and scaled by the eye distance — pose-
    and scale-equivariant by construction."""
    assert landmarks.shape[-2] == 5, "parsing maps need 5-pt landmarks"
    xs = jnp.arange(size, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, xs)                        # (S, S) x/y grids

    def one(lm):                                         # (5, 2) → (S,S,11)
        le, re = lm[0], lm[1]
        ed = jnp.maximum(jnp.linalg.norm(re - le), 1e-3)  # eye distance
        ang = jnp.arctan2(re[1] - le[1], re[0] - le[0])
        c, s = jnp.cos(ang), jnp.sin(ang)
        anchors = jnp.concatenate([lm, jnp.mean(lm[3:5], 0)[None]])  # (6,2)

        def ellipse(anchor_idx, dx, dy, rx, ry):
            ctr = anchors[anchor_idx]
            # grid → face-aligned frame (rotate by −ang around the anchor)
            px, py = gx - ctr[0], gy - ctr[1]
            u = (c * px + s * py) / ed - dx
            v = (-s * px + c * py) / ed - dy
            d2 = (u / rx) ** 2 + (v / ry) ** 2
            return jax.nn.sigmoid(sharpness * (1.0 - d2))

        regions = [ellipse(a, dx, dy, rx, ry)
                   for _, a, dx, dy, rx, ry in _PARSE_SPECS]
        skin = regions[0]
        # hair: band above the hairline, gated off the face oval
        regions.append(ellipse(*_HAIR_SPEC) * (1.0 - skin))
        # background: whatever no region claims
        fg = jnp.max(jnp.stack(regions), axis=0)
        regions.append(1.0 - fg)
        return jnp.stack(regions, axis=-1)

    batch_shape = landmarks.shape[:-2]
    flat = landmarks.reshape((-1,) + landmarks.shape[-2:]).astype(jnp.float32)
    out = jax.vmap(one)(flat)
    return out.reshape(batch_shape + (size, size, len(PARSING_LABELS)))


def prior_targets(landmarks: jax.Array, size: int = 112, sigma: float = 3.0,
                  sharpness: float = 8.0) -> jax.Array:
    """Full 16-channel prior target: 5 landmark heatmaps ++ 11 parsing maps
    — supervises every channel of the default PriorEstimator(n_priors=16)."""
    return jnp.concatenate([landmark_heatmaps(landmarks, size, sigma),
                            parsing_maps(landmarks, size, sharpness)],
                           axis=-1)


def prior_target_fn(landmarks: jax.Array, size: int = 112,
                    sigma: float = 3.0, include_parsing: bool = True):
    """Close over per-batch landmarks → an SRTrainer-compatible
    ``prior_target_fn(hr_images)`` (the images argument is ignored; the
    targets come from the annotations that ride with the batch)."""
    maps = (prior_targets(landmarks, size, sigma) if include_parsing
            else landmark_heatmaps(landmarks, size, sigma))

    def f(_hr_images):
        return maps

    return f
