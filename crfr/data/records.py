"""Packed record IO for identity-labeled face datasets (SURVEY.md §2.1
"Dataset readers": CASIA-WebFace ~0.49M imgs/10.5k ids, MS1M ~5.8M/85k).

The reference family reads identity-folder trees or mxnet ``.rec`` packs;
here the packed format is **ArrayRecord** (random-access, parallel-read — the
TPU-ecosystem native container, pairs with Grain). Each record is a
self-describing msgpack-free binary blob:

    [u32 label][u16 fmt_len][fmt bytes: 'jpeg'|'png'|'raw'][u32 h][u32 w]
    [u32 c][payload bytes]

'raw' payload is uint8 HWC pixels (already aligned 112×112 — the common case:
alignment runs once at pack time, exactly like the reference family ships
pre-aligned training sets); 'jpeg'/'png' are encoded images decoded by PIL at
load time. A plain append-only ``.crfrpack`` fallback (same blob format with
a [u64 offset] index footer) keeps everything usable if array_record is
unavailable.
"""

from __future__ import annotations

import io
import os
import struct
from typing import Iterable, Iterator

import numpy as np

_HDR = struct.Struct("<IH")
_DIMS = struct.Struct("<III")


def encode_record(label: int, image: np.ndarray | bytes,
                  fmt: str = "raw") -> bytes:
    if isinstance(image, np.ndarray):
        assert fmt == "raw" and image.dtype == np.uint8 and image.ndim == 3
        h, w, c = image.shape
        payload = image.tobytes()
    else:
        payload = image
        h = w = c = 0
    fmt_b = fmt.encode()
    return (_HDR.pack(label, len(fmt_b)) + fmt_b + _DIMS.pack(h, w, c)
            + payload)


def decode_record(blob: bytes) -> tuple[int, np.ndarray]:
    label, fmt_len = _HDR.unpack_from(blob, 0)
    off = _HDR.size
    fmt = blob[off:off + fmt_len].decode()
    off += fmt_len
    h, w, c = _DIMS.unpack_from(blob, off)
    off += _DIMS.size
    payload = blob[off:]
    if fmt == "raw":
        img = np.frombuffer(payload, np.uint8).reshape(h, w, c)
    else:
        from PIL import Image
        img = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    return label, img


# --------------------------- ArrayRecord -----------------------------------


def write_array_record(path: str,
                       records: Iterable[tuple[int, np.ndarray | bytes]],
                       fmt: str = "raw") -> int:
    """Write (label, image) pairs; returns count."""
    from array_record.python.array_record_module import ArrayRecordWriter

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    w = ArrayRecordWriter(path, "group_size:1")
    n = 0
    try:
        for label, img in records:
            w.write(encode_record(int(label), img, fmt))
            n += 1
    finally:
        w.close()
    return n


class ArrayRecordSource:
    """Random-access source: source[i] → (label, image). Grain-compatible
    (implements __len__ / __getitem__); pickles by path so it crosses into
    grain worker processes (reader reopened lazily per process)."""

    def __init__(self, path: str):
        self._path = os.path.abspath(path)
        self._reader = None
        self._pid = -1
        self._n = self._get_reader().num_records()

    def _get_reader(self):
        if self._reader is None or self._pid != os.getpid():
            from array_record.python.array_record_module import ArrayRecordReader
            self._reader = ArrayRecordReader(self._path)
            self._pid = os.getpid()
        return self._reader

    def __getstate__(self):
        return {"_path": self._path, "_n": self._n}

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._reader = None
        self._pid = -1

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int) -> tuple[int, np.ndarray]:
        [blob] = self._get_reader().read([int(i)])
        return decode_record(blob)


# --------------------------- .crfrpack fallback ----------------------------


def write_pack(path: str, records: Iterable[tuple[int, np.ndarray | bytes]],
               fmt: str = "raw") -> int:
    offsets: list[int] = []
    with open(path, "wb") as f:
        for label, img in records:
            offsets.append(f.tell())
            blob = encode_record(int(label), img, fmt)
            f.write(struct.pack("<Q", len(blob)))
            f.write(blob)
        footer_off = f.tell()
        for o in offsets:
            f.write(struct.pack("<Q", o))
        f.write(struct.pack("<QQ", len(offsets), footer_off))
    return len(offsets)


class PackSource:
    """Thread- AND process-safe random-access reader: all reads are
    positional (os.pread) so prefetch threads share one fd without seek
    races, and the fd is (re)opened lazily per process so the source
    pickles cleanly into grain worker processes."""

    def __init__(self, path: str):
        self._path = os.path.abspath(path)
        self._fd = -1
        self._pid = -1
        fd = self._get_fd()
        end = os.lseek(fd, 0, os.SEEK_END)
        n, footer_off = struct.unpack("<QQ", os.pread(fd, 16, end - 16))
        self._offsets = struct.unpack(
            f"<{n}Q", os.pread(fd, 8 * n, footer_off))

    def _get_fd(self) -> int:
        if self._fd < 0 or self._pid != os.getpid():
            self._fd = os.open(self._path, os.O_RDONLY)
            self._pid = os.getpid()
        return self._fd

    def __getstate__(self):
        return {"_path": self._path, "_offsets": self._offsets}

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._fd = -1
        self._pid = -1

    def __len__(self) -> int:
        return len(self._offsets)

    def __getitem__(self, i: int) -> tuple[int, np.ndarray]:
        fd = self._get_fd()
        off = self._offsets[i]
        (ln,) = struct.unpack("<Q", os.pread(fd, 8, off))
        return decode_record(os.pread(fd, ln, off + 8))

    def __del__(self, _close=os.close):
        # default-arg capture: os may already be torn down at interpreter exit
        try:
            if self._fd >= 0 and self._pid == os.getpid():
                _close(self._fd)
        except (OSError, AttributeError, TypeError):
            pass


class SubsetSource:
    """View of a random-access source restricted to [start, stop) — the
    per-host index shard for multi-host DP (each host feeds its own slice
    of the dataset; see crfr.parallel.multihost.process_shard)."""

    def __init__(self, source, start: int, stop: int):
        assert 0 <= start <= stop <= len(source), (start, stop, len(source))
        self._source = source
        self._start = start
        self._stop = stop

    def __len__(self) -> int:
        return self._stop - self._start

    def __getitem__(self, i: int):
        i = int(i)
        if not 0 <= i < len(self):
            raise IndexError(i)
        return self._source[self._start + i]


def open_source(path: str):
    """Dispatch on extension: .array_record → ArrayRecordSource,
    .rec → MXNet RecordIO (insightface layout, read in place — no
    conversion step needed), else .crfrpack."""
    if path.endswith((".array_record", ".arrayrecord")):
        return ArrayRecordSource(path)
    if path.endswith(".rec"):
        from crfr.data.mxrec import MXFaceSource
        return MXFaceSource(path)
    return PackSource(path)


def pack_aligned_list(list_file: str, out_path: str, root: str = "",
                      out_size: int = 112,
                      writer=write_array_record) -> int:
    """Pack a landmarked list into ALIGNED records using the native
    (C++) solve+warp path — the pack-time equivalent of the reference's
    MTCNN-alignment stage (detection itself is upstream; each line carries
    its 5 landmarks):

        <path> <label> x1 y1 x2 y2 x3 y3 x4 y4 x5 y5

    Falls back to the JAX ops path when no C++ toolchain is available.
    """
    from PIL import Image

    from crfr import native

    use_native = native.available()

    def gen() -> Iterator[tuple[int, np.ndarray]]:
        with open(list_file) as f:
            for ln in f:
                parts = ln.split()
                if len(parts) != 12:
                    continue
                path = os.path.join(root, parts[0])
                label = int(parts[1])
                lm = np.asarray(parts[2:], np.float32).reshape(5, 2)
                img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
                if use_native:
                    aligned = native.align_crop(img, lm, out_size=out_size)
                else:
                    import jax.numpy as jnp
                    from crfr.ops.warp import align_crop as jax_align
                    a = jax_align(jnp.asarray(img, jnp.float32),
                                  jnp.asarray(lm), out_size)
                    aligned = np.clip(np.floor(np.asarray(a) + 0.5),
                                      0, 255).astype(np.uint8)
                yield label, aligned

    return writer(out_path, gen())


def pack_image_folder(root: str, out_path: str, size: int | None = 112,
                      writer=write_array_record) -> tuple[int, int]:
    """Pack an identity-folder tree (root/<identity>/<img>) into records.

    Returns (num_images, num_identities). Folder names map to dense labels
    in sorted order (the reference-family ImageFolder convention).
    """
    from PIL import Image

    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    idx = {c: i for i, c in enumerate(classes)}

    def gen() -> Iterator[tuple[int, np.ndarray]]:
        for c in classes:
            d = os.path.join(root, c)
            for name in sorted(os.listdir(d)):
                p = os.path.join(d, name)
                try:
                    img = Image.open(p).convert("RGB")
                except OSError:
                    continue
                if size is not None and img.size != (size, size):
                    img = img.resize((size, size), Image.BICUBIC)
                yield idx[c], np.asarray(img, np.uint8)

    n = writer(out_path, gen())
    return n, len(classes)
