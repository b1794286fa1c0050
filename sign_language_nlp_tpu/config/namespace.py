"""Parameter-namespace plumbing.

The reference flattens its nested YAML into skorch/sklearn `prefix__key`
namespaces (reference helper.py:325-341 `prefix_args`, helper.py:316
`filter_by_keys`). This framework keeps the same flattened naming for
artifact parity (grid-params CSV columns like `module__embedding_size`)
while its own engine consumes structured dicts.
"""
from __future__ import annotations

from typing import Any, Iterable


def prefix_args(prefix: str | None, ensure_list: bool = False,
                output: dict | None = None, **kwargs) -> dict:
    """Flatten nested dicts to `prefix__key` entries; optionally wrap
    scalar leaves in single-element lists (grid mode)."""
    if output is None:
        output = {}
    for k, v in kwargs.items():
        name = k if prefix is None else f"{prefix}__{k}"
        if isinstance(v, dict):
            prefix_args(prefix=name, output=output, ensure_list=ensure_list,
                        **v)
        else:
            if ensure_list and not isinstance(v, list):
                v = [v]
            output[name] = v
    return output


def filter_by_keys(mapping: dict, keys_to_filter: Iterable[str],
                   not_in: bool = False) -> dict:
    keys = set(keys_to_filter)
    return {k: v for k, v in mapping.items() if (k in keys) != not_in}


def flatten_args(nested: dict, sep: str = "__") -> dict:
    """Fully flatten a nested dict with `sep`-joined keys."""
    out: dict[str, Any] = {}

    def rec(prefix: str, d: dict):
        for k, v in d.items():
            name = f"{prefix}{sep}{k}" if prefix else str(k)
            if isinstance(v, dict):
                rec(name, v)
            else:
                out[name] = v

    rec("", nested)
    return out


def unflatten_args(flat: dict, sep: str = "__") -> dict:
    """Inverse of `flatten_args`."""
    out: dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(sep)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out
