"""Filesystem / serialization helpers (replace commons-python `save_json`,
`read_json`, `save_items`, `get_hash`, `normpath`, `create_if_missing`,
`exists`, `filename`, `filter_files`, `save_args`; reference helper.py:8-9,
dataset/builder/dataset_builder.py:8-9)."""
from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path
from typing import Any, Iterable


def normpath(path: str | os.PathLike) -> str:
    return os.path.normpath(str(path))


def exists(path: str | os.PathLike) -> bool:
    return os.path.exists(str(path))


def create_if_missing(directory: str | os.PathLike) -> None:
    os.makedirs(str(directory), exist_ok=True)


def filename(path: str | os.PathLike, with_ext: bool = True) -> str:
    p = Path(path)
    return p.name if with_ext else p.stem


def filter_files(directory: str | os.PathLike, ext: str = "json",
                 path_as_str: bool = False) -> list:
    """All files under `directory` with extension `ext`, sorted by name."""
    paths = sorted(Path(directory).glob(f"*.{ext}"))
    return [str(p) for p in paths] if path_as_str else paths


def get_hash(obj: Any) -> str:
    """Deterministic content hash of a JSON-serializable object.

    Used to key the dataset's transient working-file cache
    (reference dataset_builder.py:29-37 semantics).
    """
    payload = json.dumps(obj, sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def read_json(path: str | os.PathLike) -> Any:
    with open(path, "r") as f:
        return json.load(f)


def save_json(obj: Any, path: str | os.PathLike) -> None:
    create_if_missing(Path(path).parent)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, default=_json_default)


def _json_default(o):
    import numpy as np

    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    return str(o)


def save_items(items: Iterable[str], path: str | os.PathLike,
               append: bool = False) -> None:
    create_if_missing(Path(path).parent)
    mode = "a" if append else "w"
    with open(path, mode) as f:
        for item in items:
            f.write(str(item))
            f.write("\n")


def save_args(args: dict, path: str | os.PathLike) -> None:
    """Persist the resolved run configuration as YAML
    (reference helper.py:35-38 `dump_args` → workdir/config.yaml)."""
    import yaml

    create_if_missing(Path(path).parent)
    clean = _yaml_sanitize(args)
    with open(path, "w") as f:
        yaml.safe_dump(clean, f, default_flow_style=False, sort_keys=False)


def _yaml_sanitize(obj):
    if isinstance(obj, dict):
        return {k: _yaml_sanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_yaml_sanitize(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)
