"""Parallel execution layer: device mesh construction, population
sharding, and multi-host grid partitioning.

Replaces the reference's entire distributed stack — a Dask
scheduler/worker farm over TCP with joblib task dispatch (reference
helper.py:490-526, main.py:77, cluster/*.sh). The communication pattern
there is pure scatter-gather of independent fits, which maps here to:
  * single host: the population axis sharded over the chip mesh via
    `NamedSharding` (ICI "communication" is just sharded compute — the
    program is collective-free);
  * multi host: `jax.distributed.initialize` + each process taking a
    deterministic partition of the cell manifest over DCN
    (SURVEY.md §5 'Distributed communication backend').
"""
from .mesh import build_mesh, population_sharding, replicated_sharding
from .distributed import (initialize_distributed, is_coordinator,
                          partition_cells, process_info)

__all__ = [
    "build_mesh",
    "population_sharding",
    "replicated_sharding",
    "initialize_distributed",
    "is_coordinator",
    "partition_cells",
    "process_info",
]
