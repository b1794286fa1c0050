"""Device-mesh construction and the population sharding rule.

The framework's one parallel axis is the *population* (grid cells):
fits are independent (SURVEY.md §2 parallelism census), so a 1-D mesh
over all local devices with the population axis sharded across it is
the whole story. Corpus arrays are replicated (they are small:
thousands of rows × a few hundred tokens); parameters, optimizer state,
per-cell hyperparameters, and index matrices shard on axis 0.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

POPULATION_AXIS = "grid"


def build_mesh(mesh_args: dict | None = None,
               devices=None) -> Optional[Mesh]:
    """Build the 1-D population mesh. mesh_args:
      devices: int — use first N devices (default: all)
      axis:    str — axis name (default "grid")
    Returns None when only one device is visible (plain jit is enough).
    """
    mesh_args = dict(mesh_args or {})
    axis = mesh_args.get("axis", POPULATION_AXIS)
    # LOCAL devices: in multi-host runs each process trains its strided
    # share of the grid on its own chips (fits never communicate), so
    # the population mesh must not span hosts.
    devs = list(devices if devices is not None else jax.local_devices())
    n = int(mesh_args.get("devices", len(devs)))
    devs = devs[:n]
    if len(devs) <= 1:
        return None
    return Mesh(np.asarray(devs), axis_names=(axis,))


def population_sharding(mesh: Optional[Mesh],
                        axis: str = POPULATION_AXIS):
    if mesh is None:
        return None
    return NamedSharding(mesh, PartitionSpec(axis))


def replicated_sharding(mesh: Optional[Mesh]):
    if mesh is None:
        return None
    return NamedSharding(mesh, PartitionSpec())


def pad_population(n_cells: int, mesh: Optional[Mesh]) -> int:
    """Population sizes must divide evenly across mesh devices; pad the
    cell count up (padded cells are zero-weight)."""
    if mesh is None:
        return n_cells
    d = mesh.devices.size
    return ((n_cells + d - 1) // d) * d
