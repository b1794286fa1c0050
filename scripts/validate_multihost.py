"""Multi-host validation: the REAL grid-search driver over two
jax.distributed processes.

Exercises the production multi-host path (the TPU-pod replacement for
the reference's Dask-farmed GridSearchCV, reference main.py:77-78,
helper.py:504): each process initializes against a shared coordinator,
`GridSearchDriver.search` partitions every shape group's pending cells
with a strided share per process, each process trains its populations
on its LOCAL (virtual CPU) devices and writes its manifest shard into
the shared workdir, the post-group barrier syncs, and every process
assembles identical cv_results from the merged manifest.

The parent then verifies:
  1. each worker's manifest shard holds exactly its strided share;
  2. the merged cv_results EQUAL a single-process run of the same
     search (cell RNG identity is packing-invariant via seed_ids).

Run: python scripts/validate_multihost.py     (spawns 2 children)
     (internal) --worker <pid> is the child entry.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_PROC = 2
# Overridable so the pytest wrapper (tests/test_multihost.py) can pick
# a free port instead of skipping when the default is busy:
PORT = int(os.environ.get("SLNLP_MH_PORT", "18476"))
LRS = [0.3, 0.1, 0.03]
CV = 2


def _setup_platform(n_devices: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")


def _make_data(seed: int = 0):
    import numpy as np

    rng = np.random.default_rng(seed)
    n, seq, vs, vt = 60, 8, 12, 6
    labels = rng.integers(2, vt, n).astype(np.int32)
    tokens = np.full((n, seq), 1, np.int32)
    lengths = rng.integers(3, seq + 1, n).astype(np.int32)
    for i in range(n):
        tokens[i, :lengths[i]] = 2 + (labels[i] - 2) % (vs - 2)
    return (tokens, lengths, labels), vs, vt


def run_search(workdir: str):
    """The same search either single-process or under jax.distributed."""
    import numpy as np

    from sign_language_nlp_tpu.parallel import build_mesh
    from sign_language_nlp_tpu.search.driver import GridSearchDriver
    from sign_language_nlp_tpu.search.grid import ParamGrid
    from sign_language_nlp_tpu.search.scoring import ScoringWrapper
    from sign_language_nlp_tpu.training.engine import TrainConfig

    data, vs, vt = _make_data()
    y = np.asarray(data[2])
    driver = GridSearchDriver(
        model_name="model.EncoderDecoderGRUAttn",
        src_vocab_size=vs, tgt_vocab_size=vt, src_pad_idx=1, tgt_pad_idx=1,
        base_model_args={"embedding_size": 8, "hidden_size": 8,
                         "num_layers": 1, "dropout": 0.0},
        train_config=TrainConfig(batch_size=16, max_epochs=3, seed=0,
                                 verbose=0, scoring=("accuracy",)),
        cv=CV, mesh=build_mesh(), workdir=workdir, verbose=0)
    grid = ParamGrid({"lr": LRS})
    scorer = ScoringWrapper("accuracy", labels=list(range(vt)))
    result = driver.search(data, y, grid, scorer)
    return [float(v) for v in result.cv_results["mean_test_score"]]


def worker(process_id: int, workdir: str) -> None:
    _setup_platform(2)

    from sign_language_nlp_tpu.parallel import initialize_distributed

    initialize_distributed({"coordinator": f"localhost:{PORT}",
                            "num_processes": N_PROC,
                            "process_id": process_id})
    import jax

    assert jax.process_count() == N_PROC

    means = run_search(workdir)
    Path(workdir, f"means_{process_id}.json").write_text(json.dumps(means))
    print(f"worker {process_id}: mean_test_score={means}", flush=True)


def main() -> None:
    if "--worker" in sys.argv:
        pid = int(sys.argv[sys.argv.index("--worker") + 1])
        worker(pid, sys.argv[sys.argv.index("--workdir") + 1])
        return
    if "--single" in sys.argv:
        _setup_platform(2)
        means = run_search(sys.argv[sys.argv.index("--single") + 1])
        print(json.dumps(means))
        return

    # Single-process reference run (own subprocess: clean jax state):
    ref_dir = tempfile.mkdtemp(prefix="multihost_ref_")
    ref = subprocess.run([sys.executable, __file__, "--single", ref_dir],
                         capture_output=True, timeout=600)
    if ref.returncode != 0:
        print(ref.stderr.decode()[-2000:])
        raise SystemExit("single-process reference run failed")
    ref_means = json.loads(ref.stdout.decode().strip().splitlines()[-1])

    workdir = tempfile.mkdtemp(prefix="multihost_")
    procs = [
        subprocess.Popen([sys.executable, __file__, "--worker", str(i),
                          "--workdir", workdir],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(N_PROC)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            print(err.decode()[-3000:])
            raise SystemExit(f"worker {i} failed rc={p.returncode}")
        outs.append(out.decode().strip())
        print(outs[-1])

    # 1. Each shard holds exactly its strided share of the 6 cells:
    n_cells = len(LRS) * CV
    shard_sizes = []
    for i in range(N_PROC):
        shard = json.loads(Path(
            workdir, f"grid_search_manifest.{i}.json").read_text())
        # Every shard carries the reserved trajectory-globals record:
        assert shard.pop("__globals__")["prng_impl"]
        shard_sizes.append(len(shard))
    assert sum(shard_sizes) == n_cells, shard_sizes
    assert max(shard_sizes) - min(shard_sizes) <= 1, shard_sizes

    # 2. Every process assembled the same result, equal to single-proc:
    means = [json.loads(Path(workdir, f"means_{i}.json").read_text())
             for i in range(N_PROC)]
    assert means[0] == means[1], (means, "processes disagree")
    for a, b in zip(means[0], ref_means):
        assert abs(a - b) < 1e-6, (means[0], ref_means)

    print(f"validate_multihost: {n_cells} cells strided "
          f"{shard_sizes} across {N_PROC} processes; merged cv_results "
          f"== single-process run — OK")


if __name__ == "__main__":
    main()
