"""ctypes bindings for the native text-metric kernels, with a pure-python
fallback (evalsuite.bleu) when no compiler is available."""

from __future__ import annotations

import ctypes
import functools

import numpy as np

from masters_thesis_tpu.native.build import build


@functools.lru_cache(maxsize=1)
def _lib():
    so = build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        # corrupt cached .so (e.g. from a pre-atomic-build checkout, or a
        # library built for another platform): rebuild once, else fall back
        # to the Python implementations instead of crashing every eval call
        from masters_thesis_tpu.native.build import remove_cached

        remove_cached()
        so = build(force=True)
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
    lib.tm_bleu_batch.restype = ctypes.c_double
    lib.tm_bleu_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.c_int32, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.tm_lcs_batch.restype = None
    lib.tm_lcs_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
    ]
    return lib


def native_available() -> bool:
    return _lib() is not None


def lcs_batch_native(a: np.ndarray, b: np.ndarray,
                     end_id: int = -1) -> np.ndarray | None:
    """Per-pair LCS lengths over (B, La)/(B, Lb) int32 rows, truncated at
    ``end_id`` and skipping 0 (<pad>). None when no native lib (callers
    fall back to the Python DP). The ROUGE-L core the C++ kernel was
    built for."""
    lib = _lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.int32)
    b = np.ascontiguousarray(b, dtype=np.int32)
    # a real raise, not assert: this guards the C++ kernel against an
    # out-of-bounds read and must survive python -O
    if not (a.ndim == b.ndim == 2 and a.shape[0] == b.shape[0]):
        raise ValueError(f"mismatched LCS batch shapes: {a.shape} vs {b.shape}")
    out = np.zeros(a.shape[0], np.int32)
    lib.tm_lcs_batch(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), a.shape[0],
        a.shape[1],
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), b.shape[1],
        end_id, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def bleu_batch_native(
    preds: np.ndarray,
    refs: np.ndarray,
    end_id: int,
    max_n: int = 4,
    smooth2: bool = True,
    return_per_sentence: bool = False,
):
    """Mean sentence BLEU over a batch (native; python fallback).

    preds: (B, Lp) int32;  refs: (B, R, Lr) int32 (R references per row).
    Rows are truncated at ``end_id``; 0 is <pad>. Semantics match the
    reference Cython kernel's truncate-at-<end> behaviour
    (cython_functions.pyx:40-43) with proper multi-reference BLEU.
    """
    preds = np.ascontiguousarray(preds, dtype=np.int32)
    refs = np.ascontiguousarray(refs, dtype=np.int32)
    if refs.ndim == 2:
        refs = refs[:, None, :]
    B, Lp = preds.shape
    Br, R, Lr = refs.shape
    if Br != B:  # real raise: must survive python -O (guards C++ OOB read)
        raise ValueError(
            f"{B} predictions vs {Br} reference rows — the native kernel "
            "would read out of bounds"
        )

    lib = _lib()
    if lib is not None:
        per = np.zeros(B, np.float64)
        mean = lib.tm_bleu_batch(
            preds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), B, Lp,
            refs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), R, Lr,
            end_id, max_n, int(smooth2),
            per.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return (mean, per) if return_per_sentence else mean

    # fallback: python implementation
    from masters_thesis_tpu.evalsuite.bleu import sentence_bleu

    def clean(row):
        out = []
        for t in row.tolist():
            if t == end_id:
                break
            if t == 0:
                continue
            out.append(t)
        return out

    per = np.zeros(B, np.float64)
    for b in range(B):
        hyp = clean(preds[b])
        rs = [clean(refs[b, r]) for r in range(R)]
        rs = [r for r in rs if r]
        per[b] = (
            sentence_bleu(
                rs, hyp, (1.0 / max_n,) * max_n,
                smoothing="method2" if smooth2 else "none",
            )
            if rs
            else 0.0
        )
    mean = float(per.mean()) if B else 0.0
    return (mean, per) if return_per_sentence else mean
