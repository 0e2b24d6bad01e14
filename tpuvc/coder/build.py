"""Compile-on-first-use build of the native rANS library.

pybind11 is not available in this environment, so the C++ coder exposes a
plain C ABI consumed through ctypes. The shared object is compiled once with
g++ -O3 and cached next to the source, keyed by a hash of the source text so
edits trigger rebuilds.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import threading

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "rans.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_LOCK = threading.Lock()


def lib_path() -> str:
    """Path to the compiled shared object, building it if needed."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so = os.path.join(_BUILD_DIR, f"librans-{digest}.so")
    if os.path.exists(so):
        return so
    with _LOCK:
        if os.path.exists(so):
            return so
        os.makedirs(_BUILD_DIR, exist_ok=True)
        tmp = so + f".tmp{os.getpid()}"
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            "-Wall", "-Werror", _SRC, "-o", tmp,
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, so)
    return so
