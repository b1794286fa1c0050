"""Native (C++) data-loading fast path, loaded via ctypes.

`build_corpus_native` runs the directory scan → JSON parse → min-freq
filter → frame composition pipeline in C++ (asl_loader.cpp) and returns
the same (src_sequences, tgt_sequences, files) triple as the Python
builder. Falls back transparently when the shared library can't be
built/loaded — the Python path in `data/builder.py` is the canonical
semantics; parity between the two is tested in tests/test_native.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import uuid
from typing import Optional

from ..utils import log

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libasl_loader.so")
_lib: Optional[ctypes.CDLL] = None
_lib_attempted = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_attempted
    if _lib is not None or _lib_attempted:
        return _lib
    _lib_attempted = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _HERE], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:
            log(f"native loader build failed (using Python path): {e}")
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.asl_build_corpus.restype = ctypes.c_long
        lib.asl_build_corpus.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                         ctypes.c_long, ctypes.c_char_p,
                                         ctypes.c_char_p]
        _lib = lib
    except OSError as e:
        log(f"native loader unavailable (using Python path): {e}")
    return _lib


def native_available() -> bool:
    return _load_library() is not None


def build_corpus_native(dataset_dir: str, fields, samples_min_freq: int,
                        composition_strategy: str):
    """Returns (src_sequences, tgt_sequences, files) or None if the
    native path is unavailable."""
    lib = _load_library()
    if lib is None:
        return None
    out_path = os.path.join(tempfile.gettempdir(),
                            f"asl_native_{uuid.uuid4().hex[:8]}.tsv")
    try:
        n = lib.asl_build_corpus(
            str(dataset_dir).encode(), ",".join(fields).encode(),
            int(samples_min_freq), composition_strategy.encode(),
            out_path.encode())
        if n < 0:
            log(f"native loader error code {n}; falling back")
            return None
        src, tgt, files = [], [], []
        with open(out_path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                label, fname, toks = line.split("\t", 2)
                src.append(toks.split("\x1f") if toks else [])
                tgt.append(label.split())
                files.append(fname)
        return src, tgt, files
    finally:
        if os.path.exists(out_path):
            os.unlink(out_path)
