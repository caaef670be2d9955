"""Beta / feature stores.

The reference's hot input path reads 64 × 1.25 MB ``.npy`` files from disk on
every training step (AttemptFour/DataLoaders/data_generator_guse.py:148-154).
On TPU we instead materialise the whole per-subject beta matrix
(10k × 327,684 fp32 ≈ 13 GB, or ≈ 6.5 GB bf16) once and keep it either

- **device-resident** (HBM): batches then carry only int32 row indices and the
  betas are gathered on-device inside the jitted train step — zero per-step
  host↔device traffic for the wide input; or
- **host-resident** (RAM / np.memmap): rows are gathered on host by the
  prefetching pipeline and shipped asynchronously.

``FeatureStore`` is the same abstraction for image features (VGG16 4096-d,
(196, 512) conv maps, InceptionV3 (64, 2048), EfficientNet-B3 1536-d — see
reference CNN/feature_extractor*.py, CNN_RNN/train.py:197-201 memmap store).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

try:  # keep importable without jax for host-only tooling
    import jax
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jax = None
    jnp = None


class ArrayStore:
    """Dense (N, ...) row store with key → row-index lookup."""

    def __init__(self, data, keys: Sequence[int], device_resident: bool = False,
                 dtype=None, pack_lanes: bool = False, mesh=None):
        keys = [int(k) for k in keys]
        assert len(keys) == len(data), "keys must match rows"
        assert len(set(keys)) == len(keys), (
            "duplicate store keys: the key->row map would silently keep "
            "only the last row per key (average repeats before storing)"
        )
        self.key_to_idx = {k: i for i, k in enumerate(keys)}
        self.keys = np.asarray(keys, dtype=np.int64)
        self.device_resident = device_resident
        self.n_cols = int(np.shape(data)[1]) if np.ndim(data) == 2 else None
        self.packed = False
        if device_resident and mesh is not None:
            # mesh-sharded store (distributed training product path): voxel
            # axis over 'model', matching the encoder's contraction-dim
            # sharding — the in-step gather then yields betas already laid
            # out P('data', 'model'). Lane packing is off: the Pallas DMA
            # gather is not GSPMD-partitionable (parallel/sharding.py
            # docstring), so sharded stores stay in the 2D layout.
            from masters_thesis_tpu.parallel.sharding import shard_store_array

            self.data = shard_store_array(data, mesh, dtype=dtype)
        elif device_resident:
            assert jnp is not None, "jax required for device-resident store"
            if pack_lanes and np.ndim(data) == 2:
                # (N, S, 128) row-block layout for the Pallas DMA gather
                # (ops/gather.py) — ~6x jnp.take row-fetch bandwidth on TPU
                from masters_thesis_tpu.ops.gather import pack_rows

                self.data = pack_rows(data, dtype=dtype)
                self.packed = True
            else:
                self.data = jnp.asarray(data, dtype=dtype)
        else:
            self.data = data if dtype is None else np.asarray(data, dtype=dtype)

    # ---- lookups ----
    def indices_for(self, keys) -> np.ndarray:
        return np.asarray([self.key_to_idx[int(k)] for k in keys], dtype=np.int32)

    def gather_host(self, idx: np.ndarray) -> np.ndarray:
        """Host-side row gather (for host-resident stores)."""
        assert not self.device_resident
        return np.asarray(self.data[idx])

    def device_array(self):
        """The full store as a device array (for on-device gather); packed
        stores return the (N, S, 128) layout — gather via ``device_gather``
        or ``ops.gather.gather_rows``."""
        assert self.device_resident
        return self.data

    def device_gather(self, idx):
        """On-device batch gather honouring the store layout; returns
        (B, n_cols)."""
        from masters_thesis_tpu.ops.gather import gather_rows

        assert self.device_resident
        return gather_rows(self.data, jnp.asarray(idx), width=self.n_cols,
                           packed=self.packed)

    @property
    def row_shape(self):
        if self.packed:
            return (self.n_cols,)
        return tuple(self.data.shape[1:])

    def __len__(self) -> int:
        return len(self.keys)

    # ---- constructors ----
    @classmethod
    def from_npy_dir(
        cls,
        directory: str | os.PathLike,
        keys: Sequence[int],
        filename_fn,
        device_resident: bool = False,
        dtype=np.float32,
    ) -> "ArrayStore":
        """Load per-key ``.npy`` files (the reference's on-disk layout,
        e.g. ``subj02_KID{key}.npy``) into one dense matrix."""
        first = np.load(os.path.join(directory, filename_fn(keys[0])))
        out = np.zeros((len(keys),) + first.shape, dtype=dtype)
        out[0] = first
        for i, key in enumerate(keys[1:], start=1):
            out[i] = np.load(os.path.join(directory, filename_fn(key)))
        return cls(out, keys, device_resident=device_resident)

    @classmethod
    def from_memmap(
        cls, path: str | os.PathLike, keys: Sequence[int], shape, dtype=np.float32
    ) -> "ArrayStore":
        """np.memmap-backed store (cf. CNN_RNN/train.py:197-201)."""
        mm = np.memmap(path, dtype=dtype, mode="r", shape=tuple(shape))
        return cls(mm, keys, device_resident=False)


FeatureStore = ArrayStore
