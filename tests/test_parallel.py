"""Mesh construction + sharded population training on the 8-virtual-
device CPU platform (conftest sets xla_force_host_platform_device_count).
"""
import jax
import numpy as np
import pytest

from sign_language_nlp_tpu.models.registry import build_model
from sign_language_nlp_tpu.parallel import build_mesh, partition_cells
from sign_language_nlp_tpu.training.engine import (PopulationTrainer,
                                                   TrainConfig, TrainTask)
from tests.test_training import _toy_data


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_build_mesh():
    mesh = build_mesh({})
    assert mesh is not None
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("grid",)
    small = build_mesh({"devices": 4})
    assert small.devices.size == 4
    single = build_mesh({"devices": 1})
    assert single is None


def test_partition_cells():
    cells = list(range(10))
    p0 = partition_cells(cells, process_id=0, num_processes=3)
    p1 = partition_cells(cells, process_id=1, num_processes=3)
    p2 = partition_cells(cells, process_id=2, num_processes=3)
    assert sorted(p0 + p1 + p2) == cells
    assert p0 == [0, 3, 6, 9]


@pytest.mark.slow
def test_sharded_population_matches_unsharded():
    """An 8-cell population sharded over the 8-device mesh must produce
    the same per-cell training trajectories as the unsharded run —
    sharding is a placement decision, not a numerics change."""
    data, labels = _toy_data(n=48)
    P = 8
    rows = np.arange(len(labels))
    lrs = np.linspace(0.05, 0.5, P).astype(np.float32)
    task = TrainTask(train_rows=[rows[:32]] * P, valid_rows=[rows[32:]] * P,
                     lr=lrs, dropout=np.zeros(P, np.float32))

    def fit(mesh):
        model = build_model("model.EncoderDecoderGRUAttn", 12, 8, 1, 1,
                            model_args={"embedding_size": 8,
                                        "hidden_size": 8,
                                        "num_layers": 1, "dropout": 0.0})
        cfg = TrainConfig(batch_size=16, max_epochs=2, seed=0, verbose=0,
                          scoring=("accuracy",))
        trainer = PopulationTrainer(model, 1, 8, cfg, mesh=mesh)
        return trainer.fit(data, task)

    out_plain = fit(None)
    out_mesh = fit(build_mesh({}))
    np.testing.assert_allclose(out_plain["history"]["valid_loss"],
                               out_mesh["history"]["valid_loss"],
                               rtol=1e-4, atol=1e-5)
    # Cells genuinely differ (per-cell lr was respected):
    assert (np.ptp(out_mesh["history"]["valid_loss"][-1]) > 0)


@pytest.mark.slow
def test_driver_search_over_mesh(built_dataset):
    """The grid driver on an 8-device mesh: a 4-cell chunk pads to 8
    slots, trains sharded, and records only the real cells."""
    from sign_language_nlp_tpu.search import (GridSearchDriver, ParamGrid,
                                              ScoringWrapper)
    from sign_language_nlp_tpu.training.engine import TrainConfig

    ds = built_dataset
    driver = GridSearchDriver(
        model_name="model.EncoderDecoderGRUAttn",
        src_vocab_size=len(ds.src_vocab),
        tgt_vocab_size=len(ds.tgt_vocab),
        src_pad_idx=1, tgt_pad_idx=1,
        base_model_args={"embedding_size": 8, "hidden_size": 8,
                         "num_layers": 1, "dropout": 0.0},
        train_config=TrainConfig(batch_size=16, max_epochs=2, seed=0,
                                 verbose=0, scoring=("accuracy",)),
        cv=2, mesh=build_mesh({}), max_population=8, verbose=0)
    grid = ParamGrid({"lr": [0.3, 0.01]})
    scorer = ScoringWrapper("accuracy", labels=ds.labels())
    data = (ds.tokens, ds.lengths, ds.labels_idx)
    result = driver.search(data, ds.labels_idx, grid, scorer)
    assert result.n_candidates == 2 and result.n_folds == 2
    scores = np.concatenate([result.cv_results["split0_test_score"],
                             result.cv_results["split1_test_score"]])
    assert np.isfinite(scores).all()
    assert result.best_params["lr"] in (0.3, 0.01)


def _mini_driver(workdir=None, mesh=None):
    from sign_language_nlp_tpu.search import GridSearchDriver
    from sign_language_nlp_tpu.training.engine import TrainConfig

    return GridSearchDriver(
        model_name="model.EncoderDecoderGRUAttn",
        src_vocab_size=12, tgt_vocab_size=8, src_pad_idx=1, tgt_pad_idx=1,
        base_model_args={"embedding_size": 8, "hidden_size": 8,
                         "num_layers": 1, "dropout": 0.0},
        train_config=TrainConfig(batch_size=16, max_epochs=2, seed=0,
                                 verbose=0, scoring=("accuracy",)),
        cv=2, mesh=mesh, workdir=workdir, verbose=0)


def test_driver_partitions_cells_across_processes(tmp_path, monkeypatch):
    """Simulated 2-process search: each process fits only its strided
    share into its own manifest shard; the post-barrier merge assembles
    the full result, identical to a single-process run. (The real
    jax.distributed path is covered by scripts/validate_multihost.py.)"""
    from sign_language_nlp_tpu.parallel import distributed
    from sign_language_nlp_tpu.search import ParamGrid, ScoringWrapper

    data, labels = _toy_data(n=48)
    y = np.asarray(labels)
    grid_args = {"lr": [0.3, 0.1, 0.03]}
    scorer = ScoringWrapper("accuracy", labels=list(range(8)))

    # Reference: single process.
    ref = _mini_driver(str(tmp_path / "single")).search(
        data, y, ParamGrid(grid_args), scorer)

    # Simulate process 1 then process 0 sequentially (shared workdir).
    shared = str(tmp_path / "shared")
    monkeypatch.setattr(
        "jax.experimental.multihost_utils.sync_global_devices",
        lambda name: None)
    results = {}
    for pid in (1, 0):
        monkeypatch.setattr(distributed, "process_info", lambda p=pid: (p, 2))
        drv = _mini_driver(shared)
        if pid == 1:
            # Process 1 finishes its share; process 0's cells are still
            # missing at merge time (no real barrier here), so the
            # driver must refuse to assemble a partial result.
            with pytest.raises(RuntimeError, match="missing"):
                drv.search(data, y, ParamGrid(grid_args), scorer)
        else:
            results[pid] = drv.search(data, y, ParamGrid(grid_args), scorer)

    import json
    from pathlib import Path

    shards = [json.loads(Path(shared, f"grid_search_manifest.{i}.json")
                         .read_text()) for i in (0, 1)]
    for sh in shards:  # each shard carries the reserved globals record
        assert sh.pop("__globals__")["prng_impl"]
    assert len(shards[0]) + len(shards[1]) == 6
    assert abs(len(shards[0]) - len(shards[1])) <= 1
    assert not set(shards[0]) & set(shards[1])

    np.testing.assert_allclose(
        results[0].cv_results["mean_test_score"],
        ref.cv_results["mean_test_score"], rtol=0, atol=1e-7)
