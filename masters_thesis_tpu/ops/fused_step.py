"""Pallas TPU kernel: fused Bahdanau-attention + LSTM-cell decode step.

One decode step of the NIC family is ~10 small XLA ops (two attention
matmuls, softmax, context reduction, two LSTM matmuls, gate math) each
bouncing activations through HBM. This kernel runs the WHOLE step for a batch
tile in VMEM:

    s      = tanh(pre + h @ W2 + b2)          # pre = W1 @ features + b1,
    e      = sum(s * v, -1) + bv              #   precomputed once per caption
    alpha  = softmax(e over regions, masked to the true region count)
    ctx    = sum(alpha * features, regions)
    z      = [ctx ; emb] @ Wx + h @ Wh + b    # fused (D+E, 4U) matmul
    c'     = sig(f) c + sig(i) tanh(g);  h' = sig(o) tanh(c')

Used by the greedy/beam decode loops (the vocab head stays in XLA — its
(256, 5001) matmul is already a single fused op). The region axis is padded
to a multiple of 8 (``pad_regions``); padded rows are masked to -inf before
the softmax so numerics match the unpadded reference bit-for-bit.

Reference behaviour being fused: attention.py:25-44 + the per-step LSTM call
in lc_NIC.greedy_predict_attention (lc_NIC.py:607-632).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pad_regions(x, multiple: int = 8):
    """Pad axis 1 (regions) up to a multiple; returns (padded, true_R)."""
    r = x.shape[1]
    rp = -(-r // multiple) * multiple
    if rp == r:
        return x, r
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, rp - r)
    return jnp.pad(x, pad), r


def _kernel(h_ref, c_ref, pre_ref, feat_ref, w2_ref, b2_ref, v_ref, bv_ref,
            emb_ref, wx_ref, wh_ref, b_ref, h_out, c_out, alpha_out,
            *, n_regions: int, units: int):
    h = h_ref[:]                                            # (Bt, U)
    c = c_ref[:]

    # attention scores
    hw = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    s = jnp.tanh(pre_ref[:] + (hw + b2_ref[0])[:, None, :])  # (Bt, Rp, A)
    e = jnp.sum(s * v_ref[0][None, None, :], axis=-1) + bv_ref[0, 0]  # (Bt, Rp)

    rp = e.shape[1]
    rid = jax.lax.broadcasted_iota(jnp.int32, e.shape, 1)
    e = jnp.where(rid < n_regions, e, -1e30)
    e = e - jnp.max(e, axis=1, keepdims=True)
    w = jnp.exp(e)
    alpha = w / jnp.sum(w, axis=1, keepdims=True)            # (Bt, Rp)
    alpha_out[:] = alpha

    ctx = jnp.sum(alpha[:, :, None] * feat_ref[:], axis=1)   # (Bt, D)

    x = jnp.concatenate([ctx, emb_ref[:]], axis=-1)          # (Bt, D+E)
    wdt = wx_ref.dtype                                       # bf16 on TPU
    z = (
        jnp.dot(x.astype(wdt), wx_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h.astype(wdt), wh_ref[:], preferred_element_type=jnp.float32)
        + b_ref[0]
    )                                                        # (Bt, 4U)
    i = jax.nn.sigmoid(z[:, :units])
    f = jax.nn.sigmoid(z[:, units : 2 * units])
    g = jnp.tanh(z[:, 2 * units : 3 * units])
    o = jax.nn.sigmoid(z[:, 3 * units :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    h_out[:] = h_new
    c_out[:] = c_new


def fused_decode_step(h, c, pre, features, w2, b2, v, bv, emb, wx, wh, b,
                      n_regions: int, batch_tile: int = 8):
    """All-array args; shapes:
    h/c (B, U); pre/features (B, Rp, A)/(B, Rp, D); w2 (U, A); b2 (A,);
    v (A,); bv scalar; emb (B, E); wx (D+E, 4U); wh (U, 4U); b (4U,).
    Returns (h', c', alpha (B, Rp)).

    On real TPU the two LSTM weight matrices are fed to the MXU in bf16
    (fp32 accumulation via preferred_element_type) — they dominate the VMEM
    budget (4.5 + 4 MB fp32, double-buffered) and bf16 is the MXU's native
    input width anyway. Interpreter mode (CPU tests) stays fp32.
    """
    B, U = h.shape
    Rp = pre.shape[1]
    bt = min(batch_tile, B)
    grid = (pl.cdiv(B, bt),)

    if jax.default_backend() == "tpu":
        wx = wx.astype(jnp.bfloat16)
        wh = wh.astype(jnp.bfloat16)

    b2r = b2.reshape(1, -1)
    vr = v.reshape(1, -1)
    bvr = jnp.asarray(bv, jnp.float32).reshape(1, 1)
    br = b.reshape(1, -1)

    batched = lambda width: pl.BlockSpec(
        (bt,) + width, lambda i: (i,) + (0,) * len(width),
        memory_space=pltpu.VMEM,
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(_kernel, n_regions=n_regions, units=U)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            batched((U,)),                       # h
            batched((U,)),                       # c
            batched(pre.shape[1:]),              # pre
            batched(features.shape[1:]),         # features
            full(w2.shape),
            full(b2r.shape),
            full(vr.shape),
            full(bvr.shape),
            batched(emb.shape[1:]),              # emb
            full(wx.shape),
            full(wh.shape),
            full(br.shape),
        ],
        out_specs=(
            batched((U,)),
            batched((U,)),
            batched((Rp,)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, U), jnp.float32),
            jax.ShapeDtypeStruct((B, U), jnp.float32),
            jax.ShapeDtypeStruct((B, Rp), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(h, c, pre, features, w2, b2r, vr, bvr, emb, wx, wh, br)


def extract_step_params(params: dict) -> dict:
    """Pull the attention/LSTM weights the kernel needs from a NIC param
    tree (models/nic.py naming)."""
    attn = params["attention"]
    return {
        "w1": attn["W1"]["kernel"], "b1": attn["W1"]["bias"],
        "w2": attn["W2"]["kernel"], "b2": attn["W2"]["bias"],
        "v": attn["V"]["kernel"][:, 0], "bv": attn["V"]["bias"][0],
        "wx": params["lstm"]["kernel"],
        "wh": params["lstm"]["recurrent_kernel"],
        "b": params["lstm"]["bias"],
        "embedding": params["embedding"],
    }


def make_fused_greedy_decoder(model, units: int, max_length: int):
    """Greedy decoder using the fused step kernel (vocab head in XLA).

    Drop-in for decode.greedy.make_greedy_decoder on NIC models with LSTM
    cells; returns (words, logits, alphas) with alphas over the true region
    count.
    """

    def decode(variables, betas, start_id):
        params = variables["params"]
        sp = extract_step_params(params)
        features = model.apply(variables, betas, False, method="encode")
        B, R, D = features.shape

        # precompute W1 @ features + b1, pad the region axis for tiling
        pre = features @ sp["w1"] + sp["b1"]
        pre_p, _ = pad_regions(pre)
        feat_p, _ = pad_regions(features)

        h = jnp.zeros((B, units), jnp.float32)
        c = jnp.zeros((B, units), jnp.float32)
        tok = jnp.full((B,), start_id, jnp.int32)

        def step(carry, _):
            h, c, tok = carry
            emb = jnp.take(sp["embedding"], tok, axis=0)
            h2, c2, alpha = fused_decode_step(
                h, c, pre_p, feat_p, sp["w2"], sp["b2"], sp["v"], sp["bv"],
                emb, sp["wx"], sp["wh"], sp["b"], n_regions=R,
            )
            logits = model.apply(
                {"params": params}, h2, False, method="head"
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (h2, c2, nxt), (nxt, logits, alpha[:, :R])

        _, (words, logits, alphas) = jax.lax.scan(
            step, (h, c, tok), None, length=max_length
        )
        return (
            jnp.moveaxis(words, 0, 1),
            jnp.moveaxis(logits, 0, 1),
            jnp.moveaxis(alphas, 0, 1),
        )

    return jax.jit(decode)
