"""Pallas TPU row gather — the HBM-store batch fetch at DMA speed.

The scanned trainer keeps the beta store in HBM and gathers each step's
batch on device. XLA lowers ``jnp.take(store, idx, axis=0)`` to a generic
gather that moves 1.3 MB rows at ~16 GB/s on v5e — 4.6 ms of the 7.2 ms
flagship step (PERF.md decomposition). This kernel instead drives one DMA
per row with the row id scalar-prefetched into the BlockSpec index_map
(``PrefetchScalarGridSpec``), which pipelines the copies at ~91 GB/s
(measured, scripts/gather_probe.py) — 5.8x.

Layout: the store is packed once at upload into (N, S, 128) with the row
width padded to a lane multiple (``pack_rows``); each grid cell copies one
full (1, S, 128) row block, so block dims equal the array dims and no
divisibility constraints apply. ``gather_rows`` accepts both layouts and
falls back to ``jnp.take`` off-TPU (and for 2D stores), so the same train
step compiles on the virtual CPU mesh.

Reference analogue: the reference reads 64 one-per-trial .npy files from
disk per batch (AttemptFour/DataLoaders/data_generator_guse.py:148-154);
here the whole store lives in HBM and the batch never touches the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def pack_rows(data, dtype=None):
    """(N, V) host/device array -> (N, S, 128) padded row-block layout."""
    import numpy as np

    arr = np.asarray(data)
    n, v = arr.shape
    vp = -(-v // LANES) * LANES
    if vp != v:
        arr = np.pad(arr, ((0, 0), (0, vp - v)))
    return jnp.asarray(arr.reshape(n, vp // LANES, LANES), dtype=dtype)


def _gather_kernel(idx_ref, store_ref, out_ref):
    out_ref[:] = store_ref[:]


def _pallas_gather(store3, idx, interpret: bool = False):
    n, s, lanes = store3.shape
    nrows = idx.shape[0]
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nrows,),
            in_specs=[pl.BlockSpec((1, s, lanes),
                                   lambda i, idx_ref: (idx_ref[i], 0, 0))],
            out_specs=pl.BlockSpec((1, s, lanes),
                                   lambda i, idx_ref: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nrows, s, lanes), store3.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), store3)


def gather_rows(store, idx, width: int | None = None,
                packed: bool | None = None):
    """Batch row gather from either store layout.

    - unpacked (2D betas or 3D (N, P, C) conv-feature rows): plain
      ``jnp.take``.
    - packed (N, S, 128): Pallas DMA gather on TPU, take+reshape elsewhere;
      flattened back to (B, S*128) and sliced to ``width`` logical columns
      when given.

    ``packed=None`` infers from the shape — but a conv-feature store with
    128 channels is indistinguishable from the packed layout, so callers
    that know (ArrayStore.packed, the trainer factories) pass it explicitly.
    """
    if packed is None:
        packed = store.ndim == 3 and store.shape[-1] == LANES
    if not packed:
        return jnp.take(store, idx, axis=0)
    assert store.ndim == 3 and store.shape[-1] == LANES, store.shape
    if jax.default_backend() == "tpu":
        # match jnp.take's jit semantics (clamp) — the DMA kernel's
        # index_map is otherwise unchecked, so an out-of-range row id would
        # silently read arbitrary HBM on TPU while CPU/tests clamp
        idx = jnp.clip(idx, 0, store.shape[0] - 1)
        rows = _pallas_gather(store, idx)
    else:
        rows = jnp.take(store, idx, axis=0)
    rows = rows.reshape(idx.shape[0], store.shape[1] * LANES)
    return rows if width is None else rows[:, :width]
