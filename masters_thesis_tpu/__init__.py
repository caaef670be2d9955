"""masters_thesis_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
"Think and Tell" fMRI-to-caption stack (reference: seang123/Masters-Thesis).

The reference is a single-GPU TF2/Keras research codebase; this package is a
brand-new framework designed for TPU hardware:

- pure-functional models (flax.linen) compiled end-to-end with ``jax.jit``;
- the Glasser-region "LocallyDense" brain encoder as a bucketed block-dense
  einsum (MXU-friendly) with an optional Pallas kernel;
- teacher-forced training and greedy/beam decoding as ``lax.scan`` loops;
- SPMD scaling over a ``jax.sharding.Mesh`` (batch data-parallel, brain-region
  model-parallel) instead of single-device eager execution;
- a host-side prefetching input pipeline feeding device-resident beta stores;
- a native C++ batch text-metric kernel (replacing the reference's Cython BLEU).

Public config surface is YAML-compatible with the reference's ``config.yaml``
(see ``/root/reference/AttemptFour/config.yaml``).
"""

from masters_thesis_tpu.version import __version__

__all__ = ["__version__"]
