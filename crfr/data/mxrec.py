"""MXNet RecordIO (``.rec``/``.idx``) reader — the reference family's
standard packed container for MS1M-class training sets (SURVEY.md §2.1
"Dataset readers": "`.rec`/`.bin` packed formats"; insightface's
``train.rec`` convention).

Format (public MXNet recordio layout, re-implemented from the spec):

  record := [u32 magic=0xced7230a][u32 lrec][data (len bytes)][pad to 4B]
            where cflag = lrec >> 29, len = lrec & 0x1fffffff
            (cflag 0 = whole record; 1/2/3 = begin/middle/end of a
            multi-part record, concatenated in order)
  .idx    := text lines "<int key>\t<byte offset>"

Image records carry an IRHeader prefix (struct '<IfQQ': flag, label,
id, id2). flag > 0 means the scalar label field is REPLACED by `flag`
f32 label values following the header; the image bytes start after them.

insightface identity packs add one convention on top: record key 0 is a
meta record whose two labels [ident_start, ident_end) delimit per-identity
index records at the tail of the file; image records are keys
1..ident_start-1 and their first label value is the identity id. The
reader detects this and exposes only the image records.

Host-side, process-safe (positional pread, lazily reopened per process —
same discipline as records.PackSource) so it drops straight into the Grain
pipeline or converts once into ArrayRecord via ``crfr pack --from-rec``.
"""

from __future__ import annotations

import io
import os
import struct
from typing import Iterable, Iterator

import numpy as np

_MAGIC = 0xCED7230A
_LEN_MASK = (1 << 29) - 1
_U32x2 = struct.Struct("<II")
_IRHEADER = struct.Struct("<IfQQ")          # flag, label, id, id2


def pack_irheader(label, img_bytes: bytes, rec_id: int = 0) -> bytes:
    """Build an image record payload (IRHeader + optional multi-label +
    image bytes). ``label``: float or 1-D float sequence."""
    labels = np.atleast_1d(np.asarray(label, np.float32))
    if labels.size == 1:
        return _IRHEADER.pack(0, float(labels[0]), rec_id, 0) + img_bytes
    return (_IRHEADER.pack(labels.size, 0.0, rec_id, 0)
            + labels.tobytes() + img_bytes)


def unpack_irheader(data: bytes) -> tuple[np.ndarray, bytes]:
    """→ (labels (k,) f32, payload bytes)."""
    flag, label, _id, _id2 = _IRHEADER.unpack_from(data, 0)
    off = _IRHEADER.size
    if flag > 0:
        labels = np.frombuffer(data, np.float32, count=flag, offset=off)
        off += 4 * flag
    else:
        labels = np.asarray([label], np.float32)
    return labels, data[off:]


class MXIndexedRecordIO:
    """Low-level indexed reader: ``read_idx(key) -> payload bytes``."""

    def __init__(self, rec_path: str, idx_path: str | None = None):
        self._path = os.path.abspath(rec_path)
        if idx_path is None:
            idx_path = os.path.splitext(rec_path)[0] + ".idx"
        self._offsets: dict[int, int] = {}
        with open(idx_path) as f:
            for ln in f:
                parts = ln.split()
                if len(parts) >= 2:
                    self._offsets[int(parts[0])] = int(parts[1])
        self._fd = -1
        self._pid = -1

    # -- process-safe fd (see records.PackSource) -----------------------
    def _get_fd(self) -> int:
        if self._fd < 0 or self._pid != os.getpid():
            self._fd = os.open(self._path, os.O_RDONLY)
            self._pid = os.getpid()
        return self._fd

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_fd"] = -1
        d["_pid"] = -1
        return d

    def __del__(self, _close=os.close):
        try:
            if self._fd >= 0 and self._pid == os.getpid():
                _close(self._fd)
        except (OSError, AttributeError, TypeError):
            pass

    # --------------------------------------------------------------
    @property
    def keys(self) -> list[int]:
        return sorted(self._offsets)

    def read_at(self, offset: int) -> bytes:
        """Read one (possibly multi-part) record starting at offset."""
        fd = self._get_fd()
        parts = []
        while True:
            magic, lrec = _U32x2.unpack(os.pread(fd, 8, offset))
            if magic != _MAGIC:
                raise ValueError(f"bad recordio magic {magic:#x} @ {offset}")
            cflag = lrec >> 29
            length = lrec & _LEN_MASK
            parts.append(os.pread(fd, length, offset + 8))
            offset += 8 + ((length + 3) & ~3)        # 4-byte padded
            if cflag in (0, 3):                       # whole / last part
                break
        return b"".join(parts)

    def read_idx(self, key: int) -> bytes:
        return self.read_at(self._offsets[key])


def _decode_image(payload: bytes) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"),
                      np.uint8)


class MXFaceSource:
    """Random-access (label, image) source over an insightface-style
    identity ``.rec`` — Grain-compatible (__len__/__getitem__), drop-in
    wherever records.open_source outputs go.

    Detects the insightface meta-record convention (key 0 with two labels
    [ident_start, ident_end)); plain im2rec files (no meta record) expose
    every key."""

    def __init__(self, rec_path: str, idx_path: str | None = None):
        self._rec = MXIndexedRecordIO(rec_path, idx_path)
        keys = self._rec.keys
        self._keys = keys
        if keys and keys[0] == 0:
            labels, payload = unpack_irheader(self._rec.read_idx(0))
            if len(payload) == 0 and labels.size >= 2:
                # insightface meta record: image keys are 1..ident_start-1
                ident_start = int(labels[0])
                self._keys = [k for k in keys if 1 <= k < ident_start]

    def __len__(self) -> int:
        return len(self._keys)

    def __getitem__(self, i: int) -> tuple[int, np.ndarray]:
        labels, payload = unpack_irheader(self._rec.read_idx(self._keys[int(i)]))
        return int(labels[0]), _decode_image(payload)


# --------------------------- writer (fixtures/tests) ------------------------


def write_mx_record(rec_path: str, records: Iterable[tuple[float, bytes]],
                    idx_path: str | None = None,
                    insightface_meta: bool = False) -> int:
    """Write an MXNet-layout .rec/.idx pair. ``records``: (label,
    jpeg/png bytes). With ``insightface_meta``, prepends the key-0 meta
    record so the file matches the MS1M train.rec shape. Used for fixture
    generation and as the inverse golden for the reader."""
    if idx_path is None:
        idx_path = os.path.splitext(rec_path)[0] + ".idx"
    recs = list(records)
    entries: list[tuple[int, bytes]] = []
    if insightface_meta:
        n = len(recs)
        meta = pack_irheader([float(n + 1), float(n + 1)], b"")
        entries.append((0, meta))
        entries += [(i + 1, pack_irheader(lb, img))
                    for i, (lb, img) in enumerate(recs)]
    else:
        entries = [(i, pack_irheader(lb, img))
                   for i, (lb, img) in enumerate(recs)]
    with open(rec_path, "wb") as f, open(idx_path, "w") as fi:
        for key, data in entries:
            fi.write(f"{key}\t{f.tell()}\n")
            f.write(_U32x2.pack(_MAGIC, len(data)))   # cflag 0
            f.write(data)
            f.write(b"\x00" * (-len(data) % 4))
    return len(recs)


# --------------------------- conversion -------------------------------------


def convert_rec(rec_path: str, out_path: str, idx_path: str | None = None,
                writer=None) -> tuple[int, int]:
    """``.rec`` → crfr records (ArrayRecord/.crfrpack): decodes each image
    once, re-encodes as raw aligned pixels. Returns (n_images, n_classes).
    Labels are cast to dense ints as-is (insightface ids are already
    dense)."""
    from crfr.data.records import write_array_record, write_pack

    if writer is None:
        writer = (write_pack if out_path.endswith(".crfrpack")
                  else write_array_record)
    src = MXFaceSource(rec_path, idx_path)
    seen: set[int] = set()

    def gen() -> Iterator[tuple[int, np.ndarray]]:
        for i in range(len(src)):
            label, img = src[i]
            seen.add(label)
            yield label, img

    n = writer(out_path, gen())
    return n, len(seen)
