"""Shared lazy g++ build + dlopen for the native runtime components.

Each ``<name>.cc`` in this directory compiles on first use to
``_<name>.so`` next to the source (rebuilt when the source is newer).
Everything degrades gracefully when no compiler is present — callers
check for ``None`` and fall back to pure Python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_libs: Dict[str, Optional[ctypes.CDLL]] = {}
_lock = threading.Lock()


def _build(name: str) -> Optional[str]:
    src = os.path.join(_HERE, f"{name}.cc")
    lib_path = os.path.join(_HERE, f"_{name}.so")
    if os.path.isfile(lib_path) and os.path.getmtime(lib_path) >= os.path.getmtime(src):
        return lib_path
    # compile to a per-process temp name, then atomic rename — concurrent
    # processes (multi-host jobs, parallel tests) never dlopen a half-written .so
    tmp_path = f"{lib_path}.tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", src, "-o", tmp_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp_path, lib_path)
    except (subprocess.CalledProcessError, FileNotFoundError, OSError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"native build of {name} failed ({msg}); falling back to pure python")
        if os.path.isfile(tmp_path):
            os.unlink(tmp_path)
        return None
    return lib_path


def load_library(name: str) -> Optional[ctypes.CDLL]:
    """Return the compiled-and-loaded ``ctypes.CDLL`` for ``name.cc`` (cached),
    or ``None`` when the toolchain is unavailable."""
    with _lock:
        if name in _libs:
            return _libs[name]
        path = _build(name)
        _libs[name] = ctypes.CDLL(path) if path else None
        return _libs[name]
