"""Tests for scripts/summarize_grid_progress.py.

The round-4 campaign (scripts/run_r4_campaign.sh) snapshots every
stage's progress into GRID_r04.json after each stage — including stages
that have not started yet. The summarizer must therefore emit a
zero-progress summary with the stage's full planned scope for a missing
manifest instead of crashing (which would silently drop the stage from
the snapshot).
"""
import json

import pytest


def _run_summary(monkeypatch, capsys, argv):
    from scripts.summarize_grid_progress import main

    monkeypatch.setattr("sys.argv", ["summarize_grid_progress.py"] + argv)
    main()
    return json.loads(capsys.readouterr().out)


@pytest.mark.parametrize("family,cells,groups", [
    ("gru", 810, 27),      # 162 candidates x 5 folds, no heads axis
    ("lstm", 810, 27),
    ("transformer", 1620, 54),
])
def test_missing_manifest_yields_zero_progress_with_full_scope(
        tmp_path, monkeypatch, capsys, family, cells, groups):
    out = _run_summary(monkeypatch, capsys, [
        "--family", family, "--workdir", str(tmp_path / "nonexistent")])
    assert out["total"]["cells_done"] == 0
    assert out["total"]["cells_total"] == cells
    assert out["total"]["groups_total"] == groups
    assert out["total"]["groups_started"] == 0
    assert out["per_group"] == []


def test_emb_subset_restricts_planned_scope(tmp_path, monkeypatch, capsys):
    # The 200/30 emb128 tier passes --emb-subset 128: one third of the
    # transformer grid (108 candidates x 5 folds, 18 shape groups).
    out = _run_summary(monkeypatch, capsys, [
        "--workdir", str(tmp_path / "nonexistent"), "--emb-subset", "128"])
    assert out["total"]["cells_total"] == 540
    assert out["total"]["groups_total"] == 18


def test_snapshot_joins_e2e_summary(tmp_path, monkeypatch):
    # When a stage finished end-to-end (run_full_grid.py wrote
    # full_grid_summary.json: grid + refit + held-out test), the
    # snapshot joins its test metrics under the family's "e2e" key so
    # GRID_r05.json alone carries the selection outcome.
    import subprocess as sp

    import scripts.snapshot_grid_progress as sgp

    (tmp_path / "work" / "full-grid-transformer").mkdir(parents=True)
    (tmp_path / "work" / "full-grid-transformer" /
     "full_grid_summary.json").write_text(json.dumps({
         "wall_s": 1234.5, "max_epochs": 40, "patience": 10,
         "test": {"accuracy": 0.91}, "heaviest_groups": []}))

    fake = json.dumps({"total": {"cells_done": 1620,
                                 "cells_total": 1620}, "per_group": []})

    class R:
        returncode = 0
        stdout = fake

    monkeypatch.setattr(sgp, "ROOT", tmp_path)
    monkeypatch.setattr(sp, "run", lambda *a, **k: R())
    out = sgp.snapshot(out_path="GRID_test.json")
    assert out["transformer"]["e2e"]["test"] == {"accuracy": 0.91}
    assert out["transformer"]["e2e"]["wall_s"] == 1234.5
    # Stages without a summary have no e2e key (still in flight):
    assert "e2e" not in out["lstm"]
    written = json.loads((tmp_path / "GRID_test.json").read_text())
    assert written["transformer"]["e2e"]["max_epochs"] == 40
