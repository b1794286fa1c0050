"""Search-layer unit tests: stratified K-fold exactness, skorch-style
inner split, ParameterGrid ordering, grid building."""
import numpy as np
import pytest

from sign_language_nlp_tpu.search import (ParamGrid, build_param_grid,
                                          stratified_kfold,
                                          train_valid_split)
from sign_language_nlp_tpu.search.grid import candidate_to_nested

sklearn = pytest.importorskip("sklearn")


@pytest.mark.parametrize("seed,n,k", [(0, 50, 5), (1, 37, 3), (2, 101, 5)])
def test_stratified_kfold_matches_sklearn(seed, n, k):
    from sklearn.model_selection import StratifiedKFold

    rng = np.random.default_rng(seed)
    y = rng.integers(0, 6, n)
    # Ensure every class has >= k members for a clean comparison:
    y = np.concatenate([y, np.repeat(np.arange(6), k)])
    ours = stratified_kfold(y, k)
    theirs = list(StratifiedKFold(n_splits=k, shuffle=False).split(
        np.zeros_like(y), y))
    for (otr, ote), (str_, ste) in zip(ours, theirs):
        np.testing.assert_array_equal(otr, str_)
        np.testing.assert_array_equal(ote, ste)


def test_train_valid_split_is_first_fold():
    y = np.array([0, 0, 0, 0, 0, 1, 1, 1, 1, 1])
    tr, va = train_valid_split(y, n_splits=5)
    otr, ova = stratified_kfold(y, 5)[0]
    np.testing.assert_array_equal(tr, otr)
    np.testing.assert_array_equal(va, ova)
    assert len(va) == 2  # 20%


def test_param_grid_order_matches_sklearn():
    from sklearn.model_selection import ParameterGrid

    grid = {"lr": [0.1, 0.01], "module__embedding_size": [64, 32],
            "module__dropout": [0.5, 0.1]}
    ours = list(ParamGrid(grid).candidates())
    theirs = list(ParameterGrid(grid))
    assert ours == theirs
    assert len(ParamGrid(grid)) == 8


def test_build_param_grid_namespacing():
    # Reference grid_args shape (config-transformer.yaml:46-53).
    grid_args = {
        "lr": [0.1, 0.01, 0.001],
        "model_args": {
            "embedding_size": [1024, 512, 128],
            "hidden_size": [512, 256, 128],
            "num_layers": [6, 4, 2],
            "dropout": [0.5, 0.1],
            "num_heads": [8, 4],
        },
    }
    grid = build_param_grid(grid_args)
    assert set(grid.grid) == {
        "lr", "module__embedding_size", "module__hidden_size",
        "module__num_layers", "module__dropout", "module__num_heads"}
    # The reference transformer grid: 3*3*3*3*2*2 = 324 candidates
    # (SURVEY.md §2).
    assert len(grid) == 324


def test_cross_product_rows_insertion_order():
    grid = ParamGrid({"b": [1, 2], "a": [3]})
    cols, rows = grid.cross_product_rows()
    assert cols == ["b", "a"]  # insertion order, not sorted
    assert rows == [(1, 3), (2, 3)]


def test_candidate_to_nested():
    nested = candidate_to_nested({
        "lr": 0.1, "module__embedding_size": 64,
        "optimizer__momentum": 0.9, "criterion__ignore_index": 1,
        "callbacks__early_stopping__patience": 3})
    assert nested["lr"] == 0.1
    assert nested["model_args"] == {"embedding_size": 64}
    assert nested["optimizer_args"] == {"momentum": 0.9}
    assert nested["criterion_args"] == {"ignore_index": 1}
    assert nested["callbacks_args"] == {"early_stopping__patience": 3}


def test_full_transformer_grid_shape_grouping():
    # The reference transformer grid (324 candidates) must split into
    # 54 shape groups (emb x hid x layers x heads) of 6 same-shape
    # candidates (lr x dropout) each — the population batching plan.
    from sign_language_nlp_tpu.search.driver import _VECTOR_KEYS

    grid = build_param_grid({
        "lr": [0.1, 0.01, 0.001],
        "model_args": {
            "embedding_size": [1024, 512, 128],
            "hidden_size": [512, 256, 128],
            "num_layers": [6, 4, 2],
            "dropout": [0.5, 0.1],
            "num_heads": [8, 4],
        },
    })
    groups = {}
    for cand in grid.candidates():
        key = tuple(sorted((k, v) for k, v in cand.items()
                           if k not in _VECTOR_KEYS))
        groups.setdefault(key, []).append(cand)
    assert len(groups) == 54
    assert all(len(v) == 6 for v in groups.values())


def test_memory_cap_for_reference_grid_points():
    # Every reference grid point must fit at least one cell on a 16G
    # chip under the static first-guess model WITH remat (the planner
    # refines with XLA memory_analysis; ASL-scale vocab/seq).
    from sign_language_nlp_tpu.search.driver import (_HBM_BUDGET_FALLBACK,
                                                     estimate_cell_bytes)

    for emb in (1024, 512, 128):
        for layers in (6, 4, 2):
            per_cell = estimate_cell_bytes(
                {"embedding_size": emb, "hidden_size": 512,
                 "num_layers": layers, "num_heads": 8},
                src_vocab=2000, tgt_vocab=200, seq_len=128, batch=50,
                remat=True)
            assert per_cell < _HBM_BUDGET_FALLBACK, (emb, layers, per_cell)


def test_population_planner_uses_measured_bytes():
    """The planner sizes populations from XLA memory_analysis() on the
    compiled epoch program (VERDICT r1 #4: fudge factors replaced by
    compiled memory facts), with even chunks and a uniform program
    population."""
    import numpy as np

    from sign_language_nlp_tpu.models.registry import build_model
    from sign_language_nlp_tpu.search.driver import GridSearchDriver
    from sign_language_nlp_tpu.training.engine import (PopulationTrainer,
                                                       TrainConfig, TrainTask)

    model = build_model(
        "model.Transformer", 64, 10, 1, 1,
        model_args={"embedding_size": 16, "hidden_size": 32,
                    "num_layers": 1, "num_heads": 2, "dropout": 0.0})
    cfg = TrainConfig(batch_size=16, max_epochs=1, seed=0, verbose=0,
                      scoring=("accuracy",))
    trainer = PopulationTrainer(model, 1, 10, cfg)

    # Measured bytes scale with the population:
    def probe(P):
        task = TrainTask(train_rows=[np.zeros(1, np.int64)] * P,
                         valid_rows=[np.zeros(1, np.int64)] * P,
                         lr=np.full(P, 0.1, np.float32),
                         dropout=np.zeros(P, np.float32),
                         pad_rows_to=(64, 16))
        return trainer.epoch_memory_bytes(100, 24, task)

    b1, b4 = probe(1), probe(4)
    assert b1 is not None and b4 is not None
    assert b4 > b1 * 2, (b1, b4)

    driver = GridSearchDriver(
        model_name="model.Transformer", src_vocab_size=64,
        tgt_vocab_size=10, src_pad_idx=1, tgt_pad_idx=1,
        base_model_args={"embedding_size": 16, "hidden_size": 32,
                         "num_layers": 1, "num_heads": 2},
        train_config=cfg, cv=2, max_population=8, verbose=0)
    tr2 = PopulationTrainer(model, 1, 10, cfg)
    pop, pad_to = driver._plan_population(
        tr2, {"embedding_size": 16, "hidden_size": 32, "num_layers": 1,
              "num_heads": 2}, 100, 24, 12, (64, 16))
    assert 1 <= pop <= 8
    assert pad_to >= pop
    # Even chunking: number of chunks is minimal for this pop.
    assert -(-12 // pop) == -(-12 // min(8, max(pop, 1)))


def test_oom_backoff_retries_execution_internal(built_dataset):
    """Execution-time "INTERNAL: TPU backend error" (how the axon
    tunnel reports HBM exhaustion — DESIGN.md §7) must halve the
    population and retry; a non-runtime INTERNAL (e.g. a compiler
    error) must surface unchanged."""
    import jax
    from sign_language_nlp_tpu.search import (GridSearchDriver, ParamGrid,
                                              ScoringWrapper)
    from sign_language_nlp_tpu.training.engine import TrainConfig

    ds = built_dataset
    data = (ds.tokens, ds.lengths, ds.labels_idx)
    scorer = ScoringWrapper("accuracy", labels=ds.labels())

    def make_driver():
        return GridSearchDriver(
            model_name="model.EncoderDecoderGRUAttn",
            src_vocab_size=len(ds.src_vocab),
            tgt_vocab_size=len(ds.tgt_vocab),
            src_pad_idx=1, tgt_pad_idx=1,
            base_model_args={"embedding_size": 8, "hidden_size": 8,
                             "num_layers": 1, "dropout": 0.0},
            train_config=TrainConfig(batch_size=16, max_epochs=2, seed=0,
                                     verbose=0, scoring=("accuracy",)),
            cv=2, max_population=4, verbose=0)

    driver = make_driver()
    real_run_chunk = GridSearchDriver._run_chunk
    seen_pops = []

    def flaky_run_chunk(self, chunk, *a, **kw):
        seen_pops.append(len(chunk))
        if len(seen_pops) == 1:
            raise jax.errors.JaxRuntimeError(
                "INTERNAL: TPU backend error (Internal).")
        return real_run_chunk(self, chunk, *a, **kw)

    GridSearchDriver._run_chunk = flaky_run_chunk
    try:
        result = driver.search(data, ds.labels_idx,
                               ParamGrid({"lr": [0.3, 0.01]}), scorer)
    finally:
        GridSearchDriver._run_chunk = real_run_chunk
    assert result.n_candidates == 2
    # First attempt at the planned pop, retry at half:
    assert len(seen_pops) >= 2 and seen_pops[1] <= max(1, seen_pops[0] // 2)
    assert np.isfinite(result.cv_results["mean_test_score"]).all()

    # Non-runtime INTERNAL errors are NOT retried:
    def broken_run_chunk(self, chunk, *a, **kw):
        raise RuntimeError("INTERNAL: something else entirely")

    GridSearchDriver._run_chunk = broken_run_chunk
    try:
        with pytest.raises(RuntimeError, match="something else"):
            make_driver().search(data, ds.labels_idx,
                                 ParamGrid({"lr": [0.3]}), scorer)
    finally:
        GridSearchDriver._run_chunk = real_run_chunk


def test_clear_caches_between_chunks_detection(monkeypatch):
    """Defaults ON only for the axon tunnel (detected via env markers —
    the plugin registers its platform as plain "tpu"); explicit env
    always wins."""
    from sign_language_nlp_tpu.search.driver import (
        _clear_caches_between_chunks)

    monkeypatch.delenv("SLNLP_CLEAR_CACHES_PER_CHUNK", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.delenv("PALLAS_AXON_REMOTE_COMPILE", raising=False)
    assert _clear_caches_between_chunks()
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert not _clear_caches_between_chunks()
    monkeypatch.setenv("PALLAS_AXON_REMOTE_COMPILE", "1")
    assert _clear_caches_between_chunks()
    monkeypatch.setenv("SLNLP_CLEAR_CACHES_PER_CHUNK", "0")
    assert not _clear_caches_between_chunks()
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.delenv("PALLAS_AXON_REMOTE_COMPILE", raising=False)
    monkeypatch.setenv("SLNLP_CLEAR_CACHES_PER_CHUNK", "1")
    assert _clear_caches_between_chunks()


def test_wedged_session_raises_actionable_error(built_dataset):
    """When INTERNAL persists down to population 1 (a wedged axon
    session), the driver must surface a resume-instructions error, not
    the raw backend message."""
    import jax
    from sign_language_nlp_tpu.search import (GridSearchDriver, ParamGrid,
                                              ScoringWrapper)
    from sign_language_nlp_tpu.training.engine import TrainConfig

    ds = built_dataset
    data = (ds.tokens, ds.lengths, ds.labels_idx)
    scorer = ScoringWrapper("accuracy", labels=ds.labels())
    driver = GridSearchDriver(
        model_name="model.EncoderDecoderGRUAttn",
        src_vocab_size=len(ds.src_vocab), tgt_vocab_size=len(ds.tgt_vocab),
        src_pad_idx=1, tgt_pad_idx=1,
        base_model_args={"embedding_size": 8, "hidden_size": 8,
                         "num_layers": 1, "dropout": 0.0},
        train_config=TrainConfig(batch_size=16, max_epochs=1, seed=0,
                                 verbose=0, scoring=("accuracy",)),
        cv=2, max_population=4, verbose=0)

    real = GridSearchDriver._run_chunk
    GridSearchDriver._run_chunk = lambda self, *a, **kw: (_ for _ in ()
        ).throw(jax.errors.JaxRuntimeError(
            "INTERNAL: TPU backend error (Internal)."))
    try:
        with pytest.raises(RuntimeError, match="wedged.*resume"):
            driver.search(data, ds.labels_idx, ParamGrid({"lr": [0.3]}),
                          scorer)
    finally:
        GridSearchDriver._run_chunk = real


def test_manifest_records_and_enforces_trajectory_globals(tmp_path):
    """VERDICT r4 #7: the manifest records process-global knobs that
    change training trajectories (prng_impl, compute_dtype); a resume
    under different values must refuse with an actionable error instead
    of silently mixing cells from different dropout bitstreams."""
    import jax
    from sign_language_nlp_tpu.search import GridSearchDriver
    from sign_language_nlp_tpu.training.engine import TrainConfig

    def make_driver(precision_args):
        return GridSearchDriver(
            model_name="model.Transformer", src_vocab_size=8,
            tgt_vocab_size=4, src_pad_idx=1, tgt_pad_idx=1,
            train_config=TrainConfig(max_epochs=1, verbose=0),
            workdir=str(tmp_path), precision_args=precision_args,
            verbose=0)

    d = make_driver({"compute_dtype": "bfloat16"})
    d._flush_manifest("grid_search", {"abc:0": {"score": -0.1}})

    # Same globals: resume loads the cell, strips the reserved record.
    loaded = d._load_manifest("grid_search")
    assert loaded == {"abc:0": {"score": -0.1}}

    # Different compute_dtype: refused, actionably.
    d32 = make_driver({"compute_dtype": "float32"})
    with pytest.raises(RuntimeError, match="compute_dtype.*bfloat16"):
        d32._load_manifest("grid_search")

    # Different prng_impl: refused. Write a manifest claiming rbg while
    # the process default is threefry (we don't flip the live global —
    # that would leak into other tests).
    cur = str(jax.config.jax_default_prng_impl)
    other = "rbg" if cur != "rbg" else "threefry2x32"
    import json as _json
    p = tmp_path / "grid_search_manifest.json"
    m = _json.loads(p.read_text())
    m["__globals__"]["prng_impl"] = other
    m["__globals__"]["compute_dtype"] = "bfloat16"
    p.write_text(_json.dumps(m))
    with pytest.raises(RuntimeError, match="prng_impl"):
        d._load_manifest("grid_search")

    # Legacy manifest without the record: accepted (backward compat),
    # and the next flush stamps it.
    p.write_text(_json.dumps({"abc:0": {"score": -0.1}}))
    assert d._load_manifest("grid_search") == {"abc:0": {"score": -0.1}}
    d._flush_manifest("grid_search", {"abc:0": {"score": -0.1}})
    assert "__globals__" in _json.loads(p.read_text())
