"""Data layer: record roundtrip, folder packing, protocol parsers, grain
pipeline determinism."""

import os

import numpy as np
import pytest

from crfr.data.records import (PackSource, decode_record, encode_record,
                               open_source, pack_image_folder, write_pack)
from crfr.data.datasets import (FolderDataset, parse_lfw_pairs,
                                parse_list_file, scface_split)
from crfr.data.pipeline import PipelineCfg, embed_batches, make_train_dataset


def _make_folder_tree(root, n_ids=3, n_per=4, size=32):
    from PIL import Image

    rng = np.random.default_rng(0)
    for i in range(n_ids):
        d = root / f"id_{i:03d}"
        d.mkdir(parents=True)
        for j in range(n_per):
            arr = rng.integers(0, 256, (size, size, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"img_{j}.jpg")


def test_record_roundtrip_raw(rng):
    img = rng.integers(0, 256, (112, 112, 3)).astype(np.uint8)
    label, out = decode_record(encode_record(7, img))
    assert label == 7
    np.testing.assert_array_equal(out, img)


def test_record_roundtrip_png(rng):
    import io
    from PIL import Image

    img = rng.integers(0, 256, (20, 20, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    label, out = decode_record(encode_record(3, buf.getvalue(), fmt="png"))
    assert label == 3
    np.testing.assert_array_equal(out, img)      # png is lossless


def test_pack_write_read(tmp_path, rng):
    recs = [(i % 5, rng.integers(0, 256, (16, 16, 3)).astype(np.uint8))
            for i in range(12)]
    p = str(tmp_path / "x.crfrpack")
    n = write_pack(p, iter(recs))
    assert n == 12
    src = PackSource(p)
    assert len(src) == 12
    for i in (0, 5, 11):
        label, img = src[i]
        assert label == recs[i][0]
        np.testing.assert_array_equal(img, recs[i][1])


def test_array_record_roundtrip(tmp_path, rng):
    from crfr.data.records import ArrayRecordSource, write_array_record

    recs = [(i, rng.integers(0, 256, (8, 8, 3)).astype(np.uint8))
            for i in range(5)]
    p = str(tmp_path / "x.array_record")
    assert write_array_record(p, iter(recs)) == 5
    src = open_source(p)
    assert isinstance(src, ArrayRecordSource)
    label, img = src[3]
    assert label == 3
    np.testing.assert_array_equal(img, recs[3][1])


def test_pack_image_folder(tmp_path):
    _make_folder_tree(tmp_path / "train")
    out = str(tmp_path / "packed.crfrpack")
    n, c = pack_image_folder(str(tmp_path / "train"), out, size=32,
                             writer=write_pack)
    assert (n, c) == (12, 3)
    src = open_source(out)
    label, img = src[0]
    assert label == 0 and img.shape == (32, 32, 3)


def test_folder_dataset(tmp_path):
    _make_folder_tree(tmp_path / "train")
    ds = FolderDataset(str(tmp_path / "train"), size=32)
    assert len(ds) == 12 and ds.num_classes == 3
    img, label = ds[0]
    assert img.shape == (32, 32, 3) and label == 0
    img, label = ds[11]
    assert label == 2


def test_lfw_pairs_parser(tmp_path):
    pf = tmp_path / "pairs.txt"
    pf.write_text("2 2\nAlice 1 2\nBob 1 3\nAlice 1 Bob 2\nCarol 1 Dave 1\n")
    proto = parse_lfw_pairs(str(pf), "/lfw")
    assert proto.n_folds == 2
    assert proto.path1[0] == "/lfw/Alice/Alice_0001.jpg"
    assert proto.path2[0] == "/lfw/Alice/Alice_0002.jpg"
    np.testing.assert_array_equal(proto.issame, [True, True, False, False])
    assert proto.path2[2] == "/lfw/Bob/Bob_0002.jpg"


def test_list_file_and_scface(tmp_path):
    lf = tmp_path / "list.txt"
    lf.write_text("a/b.jpg 3\nc d.jpg 5\n")
    paths, labels = parse_list_file(str(lf), "/root")
    assert paths == ["/root/a/b.jpg", "/root/c d.jpg"]
    np.testing.assert_array_equal(labels, [3, 5])

    gdir = tmp_path / "mug"
    pdir = tmp_path / "cams"
    gdir.mkdir()
    pdir.mkdir()
    for i in (1, 2):
        (gdir / f"{i:03d}_frontal.jpg").touch()
        for cam in (1, 2):
            for dist in (1, 2, 3):
                (pdir / f"{i:03d}_cam{cam}_{dist}.jpg").touch()
    split = scface_split(str(gdir), str(pdir), distance=2)
    assert len(split.gallery_paths) == 2
    assert len(split.probe_paths) == 4           # 2 ids × 2 cams at d2
    assert set(split.probe_labels) == {1, 2}


def test_grain_pipeline(tmp_path, rng):
    recs = [(i % 3, rng.integers(0, 256, (16, 16, 3)).astype(np.uint8))
            for i in range(20)]
    p = str(tmp_path / "t.crfrpack")
    write_pack(p, iter(recs))
    src = open_source(p)
    cfg = PipelineCfg(batch_size=8, seed=0, num_epochs=None, num_workers=0)
    it = iter(make_train_dataset(src, cfg))
    imgs, labels = next(it)
    assert imgs.shape == (8, 16, 16, 3) and imgs.dtype == np.uint8
    assert labels.shape == (8,) and labels.dtype == np.int32
    # determinism: same seed → same first batch
    it2 = iter(make_train_dataset(src, cfg))
    imgs2, labels2 = next(it2)
    np.testing.assert_array_equal(imgs, imgs2)
    np.testing.assert_array_equal(labels, labels2)


def test_sources_pickle_for_workers(tmp_path, rng):
    """Both record sources must pickle by path (grain worker processes) and
    read correctly after unpickling in-process."""
    import pickle

    from crfr.data.records import write_array_record

    recs = [(i, rng.integers(0, 256, (8, 8, 3)).astype(np.uint8))
            for i in range(6)]
    for writer, name in ((write_pack, "a.crfrpack"),
                         (write_array_record, "a.array_record")):
        p = str(tmp_path / name)
        writer(p, iter(recs))
        src = open_source(p)
        _ = src[1]
        clone = pickle.loads(pickle.dumps(src))
        label, img = clone[2]
        assert label == 2
        np.testing.assert_array_equal(img, recs[2][1])


def test_embed_batches_padding(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(5):
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(rng.integers(0, 256, (20, 20, 3)).astype(np.uint8)).save(p)
        paths.append(str(p))
    batches = list(embed_batches(paths, batch_size=4, size=112))
    assert len(batches) == 2
    assert batches[0][0].shape == (4, 112, 112, 3) and batches[0][1] == 4
    assert batches[1][0].shape == (4, 112, 112, 3) and batches[1][1] == 1
    assert (batches[1][0][1:] == 0).all()


def test_subset_source(tmp_path):
    """Per-host index shard view (multi-host DP data split)."""
    import pytest

    from crfr.data.records import SubsetSource, write_pack, open_source

    rng = np.random.default_rng(3)
    recs = [(i, rng.integers(0, 256, (8, 8, 3)).astype(np.uint8))
            for i in range(10)]
    p = str(tmp_path / "s.crfrpack")
    write_pack(p, recs)
    src = open_source(p)
    sub = SubsetSource(src, 3, 7)
    assert len(sub) == 4
    label, img = sub[0]
    assert label == 3
    np.testing.assert_array_equal(img, recs[3][1])
    assert sub[3][0] == 6
    with pytest.raises(IndexError):
        sub[4]
    # shards from process_shard tile the index space exactly
    from crfr.parallel.multihost import process_shard  # noqa: F401  (API pin)


def test_resumable_device_feed_state_tracks_consumed(tmp_path):
    """Prefetch must NOT advance the checkpointable data state past the
    batch the consumer actually received (exact-resume guarantee)."""
    from crfr.parallel.mesh import make_mesh
    from crfr.configs import MeshCfg
    from crfr.train.feed import ResumableDeviceFeed

    class FakeBatches:
        """Deterministic (images, labels) stream with grain-like state."""

        def __init__(self):
            self.i = 0

        def __iter__(self):
            return self

        def __next__(self):
            b = np.full((2, 4, 4, 3), self.i, np.uint8), np.full(2, self.i,
                                                                 np.int32)
            self.i += 1
            return b

        def get_state(self):
            return {"next": self.i}

        def set_state(self, s):
            self.i = s["next"]

    src = FakeBatches()
    feed = ResumableDeviceFeed(src, make_mesh(MeshCfg(data=1, model=1)),
                               depth=2)
    assert feed.state == {"next": 0}         # nothing consumed yet
    imgs, labels = next(feed)
    assert int(np.asarray(labels)[0]) == 0
    assert feed.state == {"next": 1}         # resume replays batch 1 next
    next(feed)
    assert feed.state == {"next": 2}
    # a fresh source fast-forwarded to feed.state yields the right batch
    src2 = FakeBatches()
    src2.set_state(feed.state)
    _, l2 = next(src2)
    assert int(l2[0]) == 2
