"""Build-on-first-use for the native C++ kernels (ctypes, no pybind11).

Compiles textmetrics.cpp with g++ -O3 into a cached shared object next to the
source (rebuilt when the source is newer). The reference's equivalent is the
Cython build step ``python setup.py build_ext --inplace``
(CNN_RNN/cython/setup.py:8-10).

Robustness contract: a missing compiler, a missing source file, or a corrupt
cached .so must degrade to the Python fallback (or to the existing good .so),
never crash metric computation. The compile goes through a temp file +
os.replace so a killed/concurrent build can never leave a truncated .so that
the mtime cache would then trust forever. No -march=native: the .so may be
reused from a shared/rsync'd checkout on a different microarchitecture, where
host-specific instructions die with SIGILL (uncatchable from Python); the
token-loop kernels are not vectorization-bound.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "textmetrics.cpp")
_SO = os.path.join(_DIR, "_textmetrics.so")


def build(force: bool = False) -> str | None:
    """Compile if needed; returns the .so path or None if no compiler."""
    have_so = os.path.exists(_SO)
    if not os.path.exists(_SRC):
        # pruned/packaged tree shipping only the built library: use it
        return _SO if have_so else None
    if (
        not force
        and have_so
        and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
    ):
        return _SO
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)  # atomic: readers see old-or-new, never partial
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return None
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return _SO


def remove_cached() -> None:
    """Drop the cached .so (used to recover from a corrupt library)."""
    try:
        os.unlink(_SO)
    except FileNotFoundError:
        pass
