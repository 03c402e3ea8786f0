"""Malformed-input error paths: every reader/loader must fail loudly with a
named error and a message pointing at the offending file — never return
garbage or crash deep inside a jitted program."""

import pickle

import numpy as np
import pytest


def test_bin_not_a_pickle(tmp_path):
    from crfr.data.bins import load_bin

    p = tmp_path / "bad.bin"
    p.write_bytes(b"notapickle")
    with pytest.raises(Exception) as ei:
        load_bin(str(p))
    assert "load key" in str(ei.value) or "pickle" in str(ei.value).lower()


def test_bin_mismatched_counts(tmp_path):
    from crfr.data.bins import load_bin

    p = tmp_path / "mismatch.bin"
    with open(p, "wb") as f:
        pickle.dump(([b"x", b"y", b"z"], [True]), f)
    with pytest.raises(AssertionError, match="3 images for 1 pairs"):
        load_bin(str(p))


def test_bank_missing_keys(tmp_path):
    from crfr.eval.bank import load_bank

    p = tmp_path / "bad.npz"
    np.savez(p, foo=np.zeros(3))
    with pytest.raises(KeyError):
        load_bank(str(p))


def test_rec_bad_magic(tmp_path):
    from crfr.data.mxrec import MXFaceSource

    (tmp_path / "bad.rec").write_bytes(b"\x00" * 10)
    (tmp_path / "bad.idx").write_text("0\t0\n")
    with pytest.raises(ValueError, match="magic"):
        MXFaceSource(str(tmp_path / "bad.rec"))


def test_serve_artifact_garbage(tmp_path):
    from crfr.serve import load_embed

    p = tmp_path / "bad.crfrx"
    p.write_bytes(b"garbage")
    with pytest.raises(ValueError, match="not a crfr serving artifact"):
        load_embed(str(p))


def test_cli_match_missing_inputs(tmp_path):
    """match without --probe-npy and without --ckpt/--list must raise the
    named assertion, not fail deep in extraction."""
    from crfr.cli import main

    np.save(tmp_path / "g.npy", np.zeros((4, 8), np.float32))
    with pytest.raises(AssertionError, match="probe-npy"):
        main(["match", "--gallery-npy", str(tmp_path / "g.npy")])


def test_cli_openset_npy_needs_labels(tmp_path):
    from crfr.cli import main

    np.save(tmp_path / "p.npy", np.zeros((4, 8), np.float32))
    np.save(tmp_path / "g.npy", np.zeros((4, 8), np.float32))
    np.save(tmp_path / "pl.npy", np.arange(4))
    np.save(tmp_path / "m.npy", np.ones(4, bool))
    with pytest.raises(AssertionError, match="gallery-labels-npy"):
        main(["eval-openset", "--probe-npy", str(tmp_path / "p.npy"),
              "--gallery-npy", str(tmp_path / "g.npy"),
              "--probe-labels-npy", str(tmp_path / "pl.npy"),
              "--mated-npy", str(tmp_path / "m.npy")])
