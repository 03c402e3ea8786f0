"""Grain input pipeline — host-side IO/decode, device-side augmentation.

SURVEY.md §2.1 "Data pipeline", rebuilt for TPU: the host does only what the
device can't (random-access record reads, JPEG decode, flip, batching); the
FLOP-bearing augmentation (bicubic degradation, normalization) runs inside
the jitted train step on device as matmuls (crfr/train/loop.py). This is the
inverse of the reference's CPU-heavy torchvision-transform stack, and it is
what keeps the input pipeline off the step's critical path.

Determinism/resume: grain's index sampler is keyed by (seed, step); resuming
from checkpoint step S re-creates the exact remaining epoch order.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np

import grain


@dataclass
class PipelineCfg:
    batch_size: int = 512
    shuffle: bool = True
    seed: int = 0
    num_epochs: int | None = None       # None → loop forever
    random_flip: bool = True
    num_workers: int = 0                # grain worker processes
    drop_remainder: bool = True


class _Flip(grain.transforms.RandomMap):
    def random_map(self, element, rng: np.random.Generator):
        label, img = element
        if rng.random() < 0.5:
            img = img[:, ::-1]
        return label, np.ascontiguousarray(img)


class _ToBatchArrays(grain.transforms.Map):
    def map(self, batch):
        labels, imgs = batch
        return np.asarray(imgs, np.uint8), np.asarray(labels, np.int32)


def make_train_dataset(source, cfg: PipelineCfg):
    """source: random-access (label, img) pairs (records.open_source /
    FolderDataset-like). Returns a grain IterDataset of (images, labels)."""
    ds = grain.MapDataset.source(source)
    if cfg.shuffle:
        ds = ds.shuffle(seed=cfg.seed)
    if cfg.num_epochs is None:
        ds = ds.repeat()
    elif cfg.num_epochs > 1:
        ds = ds.repeat(cfg.num_epochs)
    if cfg.random_flip:
        ds = ds.random_map(_Flip(), seed=cfg.seed + 1)
    ds = ds.batch(cfg.batch_size, drop_remainder=cfg.drop_remainder)
    ds = ds.map(_ToBatchArrays())
    it = ds.to_iter_dataset()
    if cfg.num_workers > 0:
        it = it.mp_prefetch(
            grain.multiprocessing.MultiprocessingOptions(
                num_workers=cfg.num_workers))
    return it


class ResumableBatches:
    """Iterator of (images u8 (B,S,S,3), labels i32 (B,)) with EXACT
    checkpointable position (grain iterator state — O(1) resume, no
    draw-and-drop replay)."""

    def __init__(self, source, cfg: PipelineCfg):
        self._it = iter(make_train_dataset(source, cfg))

    def __iter__(self):
        return self

    def __next__(self):
        return next(self._it)

    def get_state(self) -> dict:
        return self._it.get_state()

    def set_state(self, state: dict) -> None:
        self._it.set_state(state)


def train_batches(source, cfg: PipelineCfg, start_step: int = 0,
                  state: dict | None = None) -> ResumableBatches:
    """Build the train iterator. Exact resume: pass the ``state`` captured
    by ``ResumableBatches.get_state`` at checkpoint time. Fallback: with
    only ``start_step``, draws-and-drops that many batches (exact order,
    O(step) decode cost)."""
    it = ResumableBatches(source, cfg)
    if state is not None:
        it.set_state(state)
    else:
        for _ in range(start_step):
            next(it)
    return it


def embed_batches(paths: Sequence[str], batch_size: int, size: int = 112,
                  pad_to_full: bool = True, num_threads: int = 16,
                  prefetch: int = 2) -> Iterator[tuple[np.ndarray, int]]:
    """Eval-side loader: stream images from paths in fixed-size batches
    (last batch zero-padded so every jit call sees ONE static shape —
    avoids a recompile per remainder). Yields (batch u8, n_valid).

    Decode is threaded (PIL drops the GIL in the JPEG decoder) and
    ``prefetch`` whole batches are assembled ahead of the consumer, so at
    IJB-C scale the host IO overlaps the device's embed compute instead of
    serializing with it (the round-1 host-bound extraction bottleneck)."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from crfr.data.datasets import load_image

    n = len(paths)
    if n == 0:
        return

    def make_batch(pool, start):
        chunk = paths[start:start + batch_size]
        imgs = np.stack(list(pool.map(lambda p: load_image(p, size), chunk)))
        n_valid = len(chunk)
        if pad_to_full and n_valid < batch_size:
            pad = np.zeros((batch_size - n_valid, size, size, 3), np.uint8)
            imgs = np.concatenate([imgs, pad])
        return imgs, n_valid

    starts = iter(range(0, n, batch_size))
    with ThreadPoolExecutor(num_threads) as pool, \
            ThreadPoolExecutor(max(prefetch, 1)) as batcher:
        pending: deque = deque()
        for _ in range(max(prefetch, 1)):
            s = next(starts, None)
            if s is not None:
                pending.append(batcher.submit(make_batch, pool, s))
        while pending:
            out = pending.popleft().result()
            s = next(starts, None)
            if s is not None:
                pending.append(batcher.submit(make_batch, pool, s))
            yield out
