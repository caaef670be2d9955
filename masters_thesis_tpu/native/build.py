"""Build-on-first-use for the native C++ kernels (ctypes, no pybind11).

Compiles textmetrics.cpp with g++ -O3 into a cached shared object next to the
source (rebuilt when the source is newer). The reference's equivalent is the
Cython build step ``python setup.py build_ext --inplace``
(CNN_RNN/cython/setup.py:8-10).
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "textmetrics.cpp")
_SO = os.path.join(_DIR, "_textmetrics.so")


def build(force: bool = False) -> str | None:
    """Compile if needed; returns the .so path or None if no compiler."""
    if (
        not force
        and os.path.exists(_SO)
        and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
    ):
        return _SO
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError):
        return None
    return _SO
