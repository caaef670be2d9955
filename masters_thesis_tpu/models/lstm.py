"""LSTM cell with exact Keras semantics, as a scan-friendly pure step.

Keras ``layers.LSTM`` defaults replicated (needed for checkpoint parity with
the reference models, e.g. lc_NIC.py:118-124, ThinkAndTell/model.py:54-64):

- gate packing order in the fused kernels: [i | f | c̄ | o]
- kernel (in, 4U) glorot_uniform; recurrent (U, 4U) orthogonal
- bias zeros with unit forget bias (f-slice = 1)
- c' = sigmoid(f)·c + sigmoid(i)·tanh(c̄);  h' = sigmoid(o)·tanh(c')

The cell is a single fused (in+U, 4U) matmul per step — MXU-friendly — and is
shared by the teacher-forced training scan and the greedy/beam decode loops.
Keras' ``dropout``/``recurrent_dropout`` are handled by callers (the reference
steps the LSTM one token at a time, so input dropout is per-step anyway).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from masters_thesis_tpu.models.common import glorot_uniform, orthogonal


def unit_forget_bias(key, shape, dtype=jnp.float32):
    units = shape[0] // 4
    b = jnp.zeros(shape, dtype)
    return b.at[units : 2 * units].set(1.0)


class KerasLSTMCell(nn.Module):
    units: int

    @nn.compact
    def __call__(self, carry, x):
        """carry = (h, c) each (B, U); x: (B, F). Returns ((h', c'), h')."""
        h, c = carry
        kernel = self.param(
            "kernel", glorot_uniform, (x.shape[-1], 4 * self.units)
        )
        recurrent = self.param(
            "recurrent_kernel", orthogonal, (self.units, 4 * self.units)
        )
        bias = self.param("bias", unit_forget_bias, (4 * self.units,))

        # the carry rides fp32 (nic.py keeps it dtype-stable across the
        # scan); under a bf16 compute config a raw `h @ recurrent` promotes
        # that matmul to fp32 — half the cell's FLOPs silently off the bf16
        # MXU path. Cast h to the ACTIVATION dtype for the matmul only; the
        # state update below still runs against the fp32 c.
        z = x @ kernel + h.astype(x.dtype) @ recurrent + bias
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c_new = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h_new = nn.sigmoid(o) * jnp.tanh(c_new)
        # carry stays in the (fp32) state dtype; the OUTPUT rides the
        # activation dtype so downstream consumers (the vocab head's
        # dense_inter/dense_out — the decoder's largest matmuls) stay on
        # the bf16 MXU path instead of silently promoting
        return (h_new, c_new), h_new.astype(z.dtype)


class KerasGRUCell(nn.Module):
    """Keras GRU (reset_after=True v2 default) for the CNN_RNN decoder
    (reference CNN_RNN/model.py:67-115).

    Gate order [z | r | h̄]; separate input and recurrent biases.
    """

    units: int

    @nn.compact
    def __call__(self, carry, x):
        h = carry
        kernel = self.param("kernel", glorot_uniform, (x.shape[-1], 3 * self.units))
        recurrent = self.param(
            "recurrent_kernel", orthogonal, (self.units, 3 * self.units)
        )
        bias = self.param("bias", nn.initializers.zeros, (2, 3 * self.units))

        xz = x @ kernel + bias[0]
        hz = h.astype(x.dtype) @ recurrent + bias[1]  # same promotion trap
        xz_z, xz_r, xz_h = jnp.split(xz, 3, axis=-1)
        hz_z, hz_r, hz_h = jnp.split(hz, 3, axis=-1)
        z = nn.sigmoid(xz_z + hz_z)
        r = nn.sigmoid(xz_r + hz_r)
        hh = jnp.tanh(xz_h + r * hz_h)
        h_new = z * h + (1 - z) * hh
        return h_new, h_new.astype(xz.dtype)  # same output-dtype rule
