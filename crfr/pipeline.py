"""FaceRecognizer — the one-call user API: detect → align → embed → match.

What a user of the reference stitches together from ``align/``, ``backbone/``
and ``util/`` becomes one object here (SURVEY.md §1 layer map, L1+L3+L6):

    rec = FaceRecognizer.from_checkpoint("/ckpt/dir")      # or random-init
    faces = rec.detect_and_align(photo)                    # (N, 112, 112, 3)
    embs = rec.embed(faces)                                # (N, 512)
    sims = rec.similarity(embs, gallery_embs)              # cosine

Detection uses the MTCNN cascade when landmarks aren't provided (needs
imported weights to be accurate — see PARITY.md); with landmarks given, it
is pure similarity-transform alignment.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from crfr.configs import Config


class FaceRecognizer:
    def __init__(self, trainer, detector=None, flip_tta: bool = True):
        self._trainer = trainer
        self._detector = detector
        self.cfg: Config = trainer.cfg
        from crfr.eval.extract import make_extract_fn

        # state_fn threads the trainer's LIVE weights through one compiled
        # program — keep training the held trainer and embed() follows.
        self._embed = make_extract_fn(
            trainer.backbone_apply, state_fn=trainer.embed_state,
            flip=flip_tta, flip_fusion=self.cfg.eval.flip_fusion,
            image_size=self.cfg.model.input_size)

    # -- constructors --------------------------------------------------
    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, **kw) -> "FaceRecognizer":
        from crfr.train.checkpoints import Checkpointer
        from crfr.train.loop import Trainer

        ck = Checkpointer(ckpt_dir, keep=1)
        cfg_dict = ck.restore_config()
        if cfg_dict is None:
            raise FileNotFoundError(f"no config in checkpoint {ckpt_dir}")
        tr = Trainer(Config.from_dict(cfg_dict), steps_per_epoch=1000)
        tr.state = ck.restore(tr.state)
        return cls(tr, **kw)

    @classmethod
    def from_config(cls, cfg: Config, **kw) -> "FaceRecognizer":
        from crfr.train.loop import Trainer

        return cls(Trainer(cfg, steps_per_epoch=1000), **kw)

    # -- detection + alignment -----------------------------------------
    def detect_and_align(self, image: np.ndarray,
                         landmarks: np.ndarray | None = None) -> np.ndarray:
        """One photo (H, W, 3) → aligned crops (N, S, S, 3) uint8.

        With ``landmarks`` (N, 5, 2) provided, skips detection entirely.
        """
        size = self.cfg.model.input_size
        if landmarks is None:
            if self._detector is None:
                from crfr.models.mtcnn import MTCNN

                self._detector = MTCNN()
            det = self._detector.detect(np.asarray(image))
            landmarks = det.landmarks
        landmarks = np.asarray(landmarks, np.float32)
        if landmarks.size == 0:
            return np.zeros((0, size, size, 3), np.uint8)

        from crfr import native

        if native.available():
            crops = [native.align_crop(np.asarray(image, np.uint8), lm,
                                       out_size=size) for lm in landmarks]
            return np.stack(crops)
        from crfr.ops.warp import align_crop

        crops = [np.clip(np.floor(np.asarray(align_crop(
            jnp.asarray(image, jnp.float32), jnp.asarray(lm), size)) + 0.5),
            0, 255).astype(np.uint8) for lm in landmarks]
        return np.stack(crops)

    # -- embedding + matching ------------------------------------------
    def embed(self, aligned: np.ndarray) -> np.ndarray:
        """(N, S, S, 3) raw aligned pixels → (N, D) f32 embeddings."""
        if len(aligned) == 0:
            return np.zeros((0, self.cfg.model.embedding_dim), np.float32)
        return np.asarray(self._embed(jnp.asarray(aligned, jnp.float32)))

    @staticmethod
    def similarity(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Cosine similarity matrix (Na, Nb)."""
        a = a / np.linalg.norm(a, axis=-1, keepdims=True).clip(1e-12)
        b = b / np.linalg.norm(b, axis=-1, keepdims=True).clip(1e-12)
        return a @ b.T

    def verify(self, img1: np.ndarray, img2: np.ndarray,
               landmarks1: np.ndarray | None = None,
               landmarks2: np.ndarray | None = None,
               threshold: float = 0.3) -> tuple[bool, float]:
        """Two photos → (same_person, cosine). Uses the best face of each."""
        f1 = self.detect_and_align(img1, landmarks1)
        f2 = self.detect_and_align(img2, landmarks2)
        if len(f1) == 0 or len(f2) == 0:
            return False, -1.0
        e1 = self.embed(f1[:1])
        e2 = self.embed(f2[:1])
        cos = float(self.similarity(e1, e2)[0, 0])
        return cos >= threshold, cos
