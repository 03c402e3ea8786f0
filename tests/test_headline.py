"""Headline experiment (crfr/experiments/headline.py): the paper's full
pipeline — teacher → prior-aided SR-GAN → student+residual-KD →
cross-resolution eval — as ONE config-driven run.

The ordering claim itself (student_sr > student_bic > teacher_lr) is
recorded at trained scale on the real chip in BASELINE.md §headline; these
tests pin the machinery: stage wiring, metric-table schema, checkpoint
layout, and the ordering predicate."""

import json
import os

import numpy as np
import pytest


def _table(**vals):
    base = {"teacher_lr": {"verification_acc": 0.6, "rank1": 0.2},
            "student_bic": {"verification_acc": 0.7, "rank1": 0.3},
            "student_sr": {"verification_acc": 0.8, "rank1": 0.4}}
    for k, v in vals.items():
        sysname, metric = k.rsplit("_", 1)
        base[sysname][{"va": "verification_acc", "r1": "rank1"}[metric]] = v
    return {"results": {"16": base}}


def test_ordering_holds_predicate():
    from crfr.experiments.headline import ordering_holds

    assert ordering_holds(_table(), 16)
    assert ordering_holds(_table(), 16, "rank1")
    # ties in the middle are allowed, end-to-end must be strict
    assert ordering_holds(_table(student_bic_va=0.8), 16)
    assert not ordering_holds(_table(student_sr_va=0.55), 16)
    assert not ordering_holds(_table(teacher_lr_va=0.9), 16)
    # all equal -> no strict end-to-end gap
    assert not ordering_holds(
        _table(student_sr_va=0.6, student_bic_va=0.6), 16)


@pytest.mark.slow
def test_headline_micro_end_to_end(tmp_path):
    """Micro-scale full pipeline: every stage runs, the metrics table has
    the full schema, stage checkpoints land under out_dir, and the JSON
    artifact round-trips."""
    from crfr.experiments.headline import HeadlineCfg, ordering_holds, \
        run_headline

    h = HeadlineCfg(
        ids_train=6, ids_eval=4, ids_distract=4, samples_per_id=8,
        batch_size=8, teacher_steps=4, sr_steps=3, distill_steps=3,
        probe_sizes=(16,), n_pairs=8, probes_per_id=2, eval_batch=8,
        out_dir=str(tmp_path / "headline"), log_every=1000)
    table = run_headline(h)

    res = table["results"]["16"]
    for system in ("teacher_lr", "student_bic", "student_sr"):
        for metric in ("verification_acc", "rank1", "cmc5",
                       "tpir_at_fpir0.1"):
            v = res[system][metric]
            assert 0.0 <= v <= 1.0, (system, metric, v)
    # CMC is monotone in rank by construction
    assert res["student_sr"]["cmc5"] >= res["student_sr"]["rank1"]

    # stage checkpoints + artifact on disk
    assert os.path.isdir(os.path.join(h.out_dir, "teacher"))
    with open(os.path.join(h.out_dir, "headline.json")) as f:
        loaded = json.load(f)
    assert loaded["results"]["16"] == res
    assert loaded["stages"]["n_train_imgs"] == 6 * 8
    # losses are finite at micro scale too (the r4 NaN regression guard)
    assert np.isfinite(loaded["stages"]["students16"]["loss_sr"])
    assert np.isfinite(loaded["stages"]["students16"]["loss_bic"])
    assert np.isfinite(loaded["stages"]["teacher"]["loss"])

    # the predicate runs on the real table (value not asserted at this
    # untrained scale — the trained-scale claim lives in BASELINE.md)
    assert ordering_holds(table, 16) in (True, False)
