"""insightface ``.bin`` verification-set reader (lfw.bin / cfp_fp.bin /
agedb_30.bin …) — drop-in compatibility with the eval sets the reference
family ships (SURVEY.md §2.1 "Dataset readers": eval pair lists).

Format (insightface convention): a pickle of ``(bins, issame_list)`` where
``bins`` is a list of 2N encoded JPEG byte strings (consecutive pairs) and
``issame_list`` has N booleans. Torch-free: pickle + PIL decode only.
"""

from __future__ import annotations

import pickle

import numpy as np


def load_bin(path: str, image_size: int = 112
             ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """→ (img1 (N,S,S,3) u8, img2 (N,S,S,3) u8, issame (N,) bool)."""
    import io

    from PIL import Image

    with open(path, "rb") as f:
        bins, issame = pickle.load(f, encoding="bytes")
    n = len(issame)
    assert len(bins) == 2 * n, f"{path}: {len(bins)} images for {n} pairs"

    def decode(b) -> np.ndarray:
        if isinstance(b, np.ndarray):        # some dumps store raw arrays
            arr = b
        else:
            arr = np.asarray(Image.open(io.BytesIO(bytes(b))).convert("RGB"))
        if arr.shape[:2] != (image_size, image_size):
            arr = np.asarray(Image.fromarray(arr).resize(
                (image_size, image_size), Image.BICUBIC))
        return arr.astype(np.uint8)

    img1 = np.stack([decode(bins[2 * i]) for i in range(n)])
    img2 = np.stack([decode(bins[2 * i + 1]) for i in range(n)])
    return img1, img2, np.asarray(issame, bool)


def save_bin(path: str, img1: np.ndarray, img2: np.ndarray,
             issame: np.ndarray, quality: int = 95) -> None:
    """Write the insightface format (useful for fixtures / conversions)."""
    import io

    from PIL import Image

    bins = []
    for a, b in zip(img1, img2):
        for arr in (a, b):
            buf = io.BytesIO()
            Image.fromarray(np.asarray(arr, np.uint8)).save(
                buf, format="JPEG", quality=quality)
            bins.append(buf.getvalue())
    with open(path, "wb") as f:
        pickle.dump((bins, list(np.asarray(issame, bool))), f)


def evaluate_bin(path: str, extract_fn, batch_size: int = 256,
                 image_size: int = 112, n_folds: int = 10,
                 far_targets=(1e-3, 1e-2)):
    """Full .bin verification: decode → batched embed → 10-fold protocol."""
    import jax.numpy as jnp

    from crfr.eval.verification import evaluate_verification

    img1, img2, issame = load_bin(path, image_size)
    # Don't pad a tiny set to the full serving batch: the zero rows are
    # real forward-pass FLOPs (flip fusion doubles them). Round up to a
    # multiple of 8 so shape variants (= compile entries) stay few.
    batch_size = min(batch_size, max(-(-len(img1) // 8) * 8, 8))

    def embed_all(imgs: np.ndarray) -> np.ndarray:
        outs = []
        for s in range(0, len(imgs), batch_size):
            chunk = imgs[s:s + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            e = np.asarray(extract_fn(jnp.asarray(chunk)))
            outs.append(e[:batch_size - pad])
        return np.concatenate(outs)

    e1 = embed_all(img1)
    e2 = embed_all(img2)
    return evaluate_verification(e1, e2, issame, n_folds, far_targets)
