"""Multi-host fan-out over DCN.

The reference scales across nodes by pointing workers at a Dask
scheduler (reference cluster/az-start-workers.sh, helper.py:504) or by
launching self-contained SLURM jobs (cluster/run-all.sh). The TPU-pod
equivalent: every host runs the same program under
`jax.distributed.initialize`, takes a deterministic slice of the grid's
cell list, and writes its shard of the manifest — no scheduler process,
no code upload (the program IS the same binary on every host).
"""
from __future__ import annotations

from typing import Sequence

from ..utils import log


def initialize_distributed(dask_args: dict | None = None) -> None:
    """Initialize JAX multi-process execution if configured.

    Accepts the reference's `dask_args` dict for config compatibility
    (reference args.py:52): `scheduler` maps to the JAX coordinator
    address, `node`/`num_nodes`/`process_id` to the process topology.
    No-ops in single-process runs.
    """
    import jax

    args = dict(dask_args or {})
    coordinator = args.get("coordinator") or args.get("scheduler")
    if not coordinator:
        return
    num_processes = int(args.get("num_processes", args.get("num_nodes", 1)))
    process_id = int(args.get("process_id", args.get("node", 0)))
    log(f"jax.distributed.initialize(coordinator={coordinator}, "
        f"num_processes={num_processes}, process_id={process_id})")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def process_info() -> tuple:
    import jax

    return jax.process_index(), jax.process_count()


def is_coordinator() -> bool:
    """True on the process that owns artifact writes (process 0; always
    True single-process). Used to keep multi-host runs from racing on
    the shared workdir's CSV/JSON/checkpoint files."""
    import jax

    return jax.process_index() == 0


def partition_cells(cells: Sequence, process_id: int | None = None,
                    num_processes: int | None = None) -> list:
    """Deterministic strided partition of the cell list across hosts:
    host i takes cells i, i+P, i+2P, ... All hosts enumerate the same
    list, so no coordination is needed; the shared manifest merges
    results (SURVEY.md §5 failure detection / resume)."""
    if process_id is None or num_processes is None:
        process_id, num_processes = process_info()
    return list(cells[process_id::num_processes])
