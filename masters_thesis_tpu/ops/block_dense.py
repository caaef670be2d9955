"""Pallas TPU kernel: fused block-dense matmul + bias + LeakyReLU.

The LocallyDense encoder's per-bucket compute is
``out[b,g,:] = leaky(x[b,g,:] @ w[g] + bias[g])`` — a batched matmul whose
weight blocks stream once from HBM per step. This kernel fuses the bias add
and activation into the matmul epilogue (one HBM round-trip for the output
instead of three) with a grid over (group, batch-tile).

Training support: forward runs the Pallas kernel; the backward pass is plain
XLA einsums via ``jax.custom_vjp`` (gradient wrt the padded weight slots stays
zero because the corresponding inputs are zero).

Falls back to interpreter mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, o_ref, *, slope: float):
    x = x_ref[0]                            # (B, P)
    w = w_ref[0]                            # (P, D)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    y = y + b_ref[0]                        # (1, D) broadcasts over B
    o_ref[0] = jnp.where(y >= 0, y, slope * y)


def _forward(xg, w, bias, slope: float):
    # TPU tiling wants the blocked axes last: group axis leads the grid, so
    # work in (G, B, P) layout with full-(B, P) blocks per program.
    B, G, P = xg.shape
    D = w.shape[-1]
    xt = jnp.transpose(xg, (1, 0, 2))       # (G, B, P)
    bias3 = bias[:, None, :]                # (G, 1, D) — TPU-tileable block
    out = pl.pallas_call(
        functools.partial(_kernel, slope=slope),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, B, P), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, D), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, D), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, B, D), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(xt, w, bias3)
    return jnp.transpose(out, (1, 0, 2))    # (B, G, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def block_dense_leaky(xg, w, bias, slope: float = 0.2):
    """xg (B, G, P), w (G, P, D), bias (G, D) -> leaky(xg @ w + bias)."""
    return _forward(xg, w, bias, slope)


def _fwd(xg, w, bias, slope):
    out = _forward(xg, w, bias, slope)
    return out, (xg, w, out)


def _bwd(slope, res, g):
    xg, w, out = res
    dact = jnp.where(out >= 0, 1.0, slope) * g          # (B, G, D)
    dx = jnp.einsum("bgd,gpd->bgp", dact, w,
                    preferred_element_type=jnp.float32)
    dw = jnp.einsum("bgp,bgd->gpd", xg, dact,
                    preferred_element_type=jnp.float32)
    db = dact.sum(axis=0)
    return dx, dw, db


block_dense_leaky.defvjp(_fwd, _bwd)
