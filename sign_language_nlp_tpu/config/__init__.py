"""Declarative config/flag system (replaces commons-python `load_args` +
`Argument`; reference args.py:1-53, main.py:131-132).

Every argument is addressable both as a CLI flag and as a key in the YAML
file passed via ``--config``; CLI overrides YAML; dict-typed flags accept
inline Python-literal dicts (reference README.md:141 usage).
"""
from .arguments import Argument, load_args
from .namespace import flatten_args, filter_by_keys, prefix_args
from .schema import ARGUMENTS

__all__ = [
    "Argument",
    "load_args",
    "ARGUMENTS",
    "prefix_args",
    "filter_by_keys",
    "flatten_args",
]
