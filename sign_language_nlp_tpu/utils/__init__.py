"""Core utilities: logging, filesystem IO, hashing, workdir templating.

Native replacement for the reference's private `commons-python` dependency
(reference pyproject.toml:14; used at main.py:1-2, helper.py:7-9,
dataset/builder/dataset_builder.py:7-9).
"""
from .logging import log, warn, auto_log_progress, set_verbosity
from .io import (
    create_if_missing,
    exists,
    filename,
    filter_files,
    get_hash,
    normpath,
    read_json,
    save_args,
    save_items,
    save_json,
)
from .workdir import format_dir, dump_args

__all__ = [
    "log",
    "warn",
    "auto_log_progress",
    "set_verbosity",
    "create_if_missing",
    "exists",
    "filename",
    "filter_files",
    "get_hash",
    "normpath",
    "read_json",
    "save_args",
    "save_items",
    "save_json",
    "format_dir",
    "dump_args",
]
