"""Argument descriptor + CLI/YAML loader.

Re-creates the behavior of commons-python's `Argument` / `load_args`
(reference args.py:1, main.py:132): argparse schema built from a
declarative list, a ``--config <yaml>`` flag whose contents provide
defaults, CLI values overriding YAML, `dict`-typed flags parsed from
inline Python literals, and `required` enforced only after the merge.
"""
from __future__ import annotations

import argparse
import ast
from dataclasses import dataclass, field
from typing import Any, Sequence


@dataclass
class Argument:
    """One CLI/YAML-mergeable argument."""

    short: str
    name: str  # e.g. "--model"
    type: type = str
    default: Any = None
    required: bool = False
    help: str = ""
    options: Sequence[str] | None = field(default=None)

    def __init__(self, short, name, type=str, default=None, required=False,
                 help="", options=None):
        self.short = short
        self.name = name
        self.type = type
        self.default = default
        self.required = required
        self.help = help
        self.options = options

    @property
    def key(self) -> str:
        return self.name.lstrip("-").replace("-", "_")


def _parse_value(arg: Argument, raw: Any) -> Any:
    if raw is None:
        return None
    if arg.type is dict or arg.type is list:
        if isinstance(raw, (dict, list)):
            return raw
        try:
            return ast.literal_eval(str(raw))
        except (ValueError, SyntaxError):
            if arg.type is list:
                # `--scoring accuracy` / `--scoring accuracy,f1_weighted`:
                # bare names parse as comma-separated strings.
                return [s.strip() for s in str(raw).split(",") if s.strip()]
            raise
    if arg.type is bool:
        if isinstance(raw, bool):
            return raw
        return str(raw).strip().lower() in ("1", "true", "yes", "y")
    return arg.type(raw)


def load_args(prog: str, arguments: Sequence[Argument],
              argv: Sequence[str] | None = None) -> dict:
    """Parse CLI args merged over a ``--config`` YAML file.

    Returns a plain dict keyed by argument name (same key set the
    reference exposes via ``vars(load_args(...))``, main.py:132).
    """
    parser = argparse.ArgumentParser(prog=prog)
    parser.add_argument("-c", "--config", help="YAML config file", default=None)
    for arg in arguments:
        # All values land as raw strings first; typing + required checks
        # happen after the YAML merge so a YAML-provided value satisfies
        # a required flag.
        parser.add_argument(arg.short, arg.name, default=None, help=arg.help)

    ns = parser.parse_args(argv)
    cli = vars(ns)

    yaml_values: dict = {}
    if cli.get("config"):
        import yaml

        with open(cli["config"]) as f:
            yaml_values = yaml.safe_load(f) or {}

    merged: dict = {}
    for arg in arguments:
        key = arg.key
        raw = cli.get(key)
        if raw is None:
            raw = yaml_values.get(key)
        if raw is None:
            raw = arg.default
        value = _parse_value(arg, raw)
        if arg.options is not None and value is not None:
            if value not in arg.options:
                parser.error(
                    f"argument {arg.name}: invalid choice {value!r} "
                    f"(choose from {list(arg.options)})")
        if arg.required and value is None:
            parser.error(f"argument {arg.name} is required "
                         "(via CLI or --config YAML)")
        merged[key] = value

    # Preserve extra YAML keys not covered by the schema (forward compat).
    for key, val in yaml_values.items():
        if key not in merged:
            merged[key] = val
    return merged
