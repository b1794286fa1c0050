"""Multi-host validation: two real processes over jax.distributed.

Exercises the actual DCN-style path the cluster scripts use
(parallel/distributed.py): each process initializes against a shared
coordinator, takes its strided partition of the grid cells, trains its
populations on its local (CPU) devices, and writes its shard of the
manifest; the parent then merges and checks coverage.

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
N_CELLS = 6
PORT = 18476


def worker(process_id: int, workdir: str) -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from sign_language_nlp_tpu.parallel import (initialize_distributed,
                                                partition_cells)
    from sign_language_nlp_tpu.models.registry import build_model
    from sign_language_nlp_tpu.training.engine import (PopulationTrainer,
                                                       TrainConfig,
                                                       TrainTask)
    import numpy as np

    initialize_distributed({"coordinator": f"localhost:{PORT}",
                            "num_processes": N_PROC,
                            "process_id": process_id})
    assert jax.process_count() == N_PROC

    cells = list(range(N_CELLS))
    mine = partition_cells(cells, process_id, N_PROC)

    rng = np.random.default_rng(0)
    n, seq, vs, vt = 48, 8, 12, 6
    tokens = rng.integers(2, vs, (n, seq)).astype(np.int32)
    lengths = rng.integers(2, seq + 1, n).astype(np.int32)
    labels = rng.integers(2, vt, n).astype(np.int32)
    rows = np.arange(n)

    model = build_model("model.EncoderDecoderGRUAttn", vs, vt, 1, 1,
                        model_args={"embedding_size": 8, "hidden_size": 8,
                                    "num_layers": 1, "dropout": 0.0})
    cfg = TrainConfig(batch_size=16, max_epochs=2, seed=0, verbose=0,
                      scoring=("accuracy",))
    trainer = PopulationTrainer(model, 1, vt, cfg)
    task = TrainTask(train_rows=[rows[:32]] * len(mine),
                     valid_rows=[rows[32:]] * len(mine),
                     lr=np.full(len(mine), 0.2, np.float32),
                     dropout=np.zeros(len(mine), np.float32))
    out = trainer.fit((tokens, lengths, labels), task)
    losses = np.asarray(out["history"]["valid_loss"][-1])

    shard = {str(c): float(losses[i]) for i, c in enumerate(mine)}
    Path(workdir, f"manifest_shard_{process_id}.json").write_text(
        json.dumps(shard))
    print(f"worker {process_id}: cells {mine} done", flush=True)


def main() -> None:
    if "--worker" in sys.argv:
        pid = int(sys.argv[sys.argv.index("--worker") + 1])
        worker(pid, sys.argv[sys.argv.index("--workdir") + 1])
        return

    workdir = tempfile.mkdtemp(prefix="multihost_")
    procs = [
        subprocess.Popen([sys.executable, __file__, "--worker", str(i),
                          "--workdir", workdir],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(N_PROC)
    ]
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            print(err.decode()[-2000:])
            raise SystemExit(f"worker {i} failed rc={p.returncode}")
        print(out.decode().strip())

    merged = {}
    for i in range(N_PROC):
        merged.update(json.loads(
            Path(workdir, f"manifest_shard_{i}.json").read_text()))
    assert sorted(map(int, merged)) == list(range(N_CELLS)), merged
    assert all(v == v and v < 100 for v in merged.values())
    print(f"validate_multihost: ALL {N_CELLS} cells covered across "
          f"{N_PROC} processes — OK")


if __name__ == "__main__":
    main()
