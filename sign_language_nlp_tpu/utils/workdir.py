"""Workdir templating + config dumping (reference helper.py:35-38,307-313)."""
from __future__ import annotations

from datetime import datetime

from .io import create_if_missing, normpath, save_args


def format_dir(directory: str | None, **kwargs) -> str:
    """Expand `{model}` / `{datetime:%...}`-style placeholders in a workdir
    template (reference helper.py:307-313)."""
    if directory is None:
        return ""
    params = {"datetime": datetime.now(), **kwargs}
    return normpath(directory.format(**params))


def dump_args(args: dict) -> None:
    """Write resolved args to `<workdir>/config.yaml`
    (reference helper.py:35-38)."""
    workdir = args["workdir"]
    create_if_missing(workdir)
    save_args(args, normpath(f"{workdir}/config.yaml"))
