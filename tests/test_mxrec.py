"""MXNet RecordIO reader: byte-level format, insightface meta convention,
conversion into the train pipeline (SURVEY.md §2.1 dataset readers)."""

import io
import json
import struct

import numpy as np
import pytest

from crfr.data.mxrec import (MXFaceSource, MXIndexedRecordIO, convert_rec,
                             pack_irheader, unpack_irheader, write_mx_record)


def _jpeg(rng, size=24):
    from PIL import Image

    img = rng.integers(0, 256, (size, size, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "PNG")     # PNG: lossless round-trip
    return img, buf.getvalue()


def test_irheader_roundtrip():
    labels, payload = unpack_irheader(pack_irheader(7.0, b"abc"))
    assert labels.tolist() == [7.0] and payload == b"abc"
    labels, payload = unpack_irheader(pack_irheader([3.0, 9.0], b"xyz"))
    assert labels.tolist() == [3.0, 9.0] and payload == b"xyz"


def test_rec_read_and_padding(tmp_path, rng):
    # odd-length payloads exercise the 4-byte padding logic
    recs = [(float(i), bytes(rng.integers(0, 256, 7 + i).tolist()))
            for i in range(5)]
    rec = str(tmp_path / "t.rec")
    write_mx_record(rec, recs)
    rd = MXIndexedRecordIO(rec)
    assert rd.keys == list(range(5))
    for i, (lb, data) in enumerate(recs):
        labels, payload = unpack_irheader(rd.read_idx(i))
        assert labels[0] == lb and payload == data


def test_rec_bad_magic(tmp_path):
    rec = str(tmp_path / "bad.rec")
    write_mx_record(rec, [(0.0, b"ab")])
    with open(rec, "r+b") as f:
        f.write(struct.pack("<I", 0xDEAD))
    with pytest.raises(ValueError, match="magic"):
        MXIndexedRecordIO(rec).read_idx(0)


def test_face_source_insightface_meta(tmp_path, rng):
    imgs, recs = [], []
    for i in range(6):
        img, enc = _jpeg(rng)
        imgs.append(img)
        recs.append((float(i % 3), enc))
    rec = str(tmp_path / "ms1m.rec")
    write_mx_record(rec, recs, insightface_meta=True)
    src = MXFaceSource(rec)
    assert len(src) == 6                     # meta record hidden
    label, img = src[0]
    assert label == 0 and np.array_equal(img, imgs[0])
    label, img = src[5]
    assert label == 2 and np.array_equal(img, imgs[5])


def test_face_source_plain_im2rec(tmp_path, rng):
    _, enc = _jpeg(rng)
    rec = str(tmp_path / "plain.rec")
    write_mx_record(rec, [(4.0, enc), (5.0, enc)])
    src = MXFaceSource(rec)
    assert len(src) == 2 and src[1][0] == 5


def test_convert_rec_into_train_pipeline(tmp_path, rng):
    """A synthetic MS1M-layout .rec round-trips: convert → open_source →
    grain train_batches (the VERDICT 'real MS1M drop-in' check)."""
    recs = []
    for i in range(8):
        _, enc = _jpeg(rng, size=16)
        recs.append((float(i % 2), enc))
    rec = str(tmp_path / "train.rec")
    write_mx_record(rec, recs, insightface_meta=True)
    out = str(tmp_path / "train.crfrpack")
    n, c = convert_rec(rec, out)
    assert (n, c) == (8, 2)

    from crfr.data.pipeline import PipelineCfg, train_batches
    from crfr.data.records import open_source

    batches = train_batches(open_source(out),
                            PipelineCfg(batch_size=4, seed=0))
    imgs, labels = next(batches)
    assert imgs.shape == (4, 16, 16, 3) and imgs.dtype == np.uint8
    assert set(labels.tolist()) <= {0, 1}


def test_open_source_rec_direct(tmp_path, rng):
    """open_source('x.rec') reads MXNet records in place — MS1M train.rec
    is a drop-in train source without conversion."""
    from crfr.data.records import open_source

    _, enc = _jpeg(rng, size=16)
    rec = str(tmp_path / "d.rec")
    write_mx_record(rec, [(0.0, enc), (1.0, enc)], insightface_meta=True)
    src = open_source(rec)
    assert len(src) == 2 and src[1][0] == 1
    assert src[0][1].shape == (16, 16, 3)


def test_pack_cli_from_rec(tmp_path, rng, capsys):
    from crfr.cli import main

    _, enc = _jpeg(rng, size=16)
    rec = str(tmp_path / "x.rec")
    write_mx_record(rec, [(0.0, enc), (1.0, enc), (1.0, enc)],
                    insightface_meta=True)
    out = str(tmp_path / "x.crfrpack")
    assert main(["pack", "--from-rec", rec, "--out", out]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["images"] == 3 and res["identities"] == 2
