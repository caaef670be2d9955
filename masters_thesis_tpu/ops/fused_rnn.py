"""Pallas TPU kernels: the 15-step attention+LSTM recurrence, fwd AND bwd.

After the round-2 input-path fixes the flagship train step is dominated by
the teacher-forced decoder chain (~2.6 of 3.8 ms): 15 sequential
attention -> LSTM segments forward plus their reverse-mode mirror, each a
string of small matmuls XLA schedules one-after-another. These kernels run
the whole chain for a batch tile with h/c and weights VMEM-resident:

  forward:   s_t   = tanh(pre + h_t W2 + b2)          # pre = feat@W1 + b1
             e_t   = s_t·v + bv ; alpha_t = softmax_R(e_t)
             ctx_t = alpha_t^T feat
             z_t   = [ctx_t; emb_t] Wx + h_t Wh + b   # gates i,f,g,o
             c_t+1 = sig(f) c_t + sig(i) tanh(g) ; h_t+1 = sig(o) tanh(c_t+1)

  backward:  the exact reverse-mode chain, hand-derived (LSTM gate jacobians,
             softmax jacobian, tanh-score jacobian), replayed from saved
             h/c stacks + output alphas; x_t/z_t/gates are recomputed rather
             than saved (two small matmuls per step beat 15x(B,4U) of HBM).

Exposed through ``fused_rnn`` (jax.custom_vjp): differentiable wrt every
array input, so the surrounding XLA graph owns the encoder, W1/b1 (via the
``pre``/``feat`` cotangents), the embedding table (via ``emb``), the vocab
head and the loss. No dropout inside (the fused train path is gated to
dropout-free segments of the config; see train/steps.py wiring).

Layout notes: regions padded to sublane multiple (pad rows of ``pre`` carry
-inf-masked scores exactly like the whole-decode kernel); weight-gradient
outputs are per-batch-tile (grid-indexed leading axis) and summed by XLA —
Pallas grids cannot accumulate across tiles into one output block.

Reference hot loop: AttemptFour/Model/lc_NIC.py:244-256 (call_attention) and
its tape.gradient mirror (:328-408) — eager TF; here one kernel each way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from masters_thesis_tpu.ops.fused_decode import pad_regions


def _gates(z, units):
    i = jax.nn.sigmoid(z[:, :units])
    f = jax.nn.sigmoid(z[:, units:2 * units])
    g = jnp.tanh(z[:, 2 * units:3 * units])
    o = jax.nn.sigmoid(z[:, 3 * units:])
    return i, f, g, o


def _fwd_kernel(pre_ref, feat_ref, emb_ref, w2_ref, b2_ref, v_ref, bv_ref,
                wxc_ref, wxe_ref, wh_ref, b_ref,
                hseq_out, alpha_out, hst_out, cst_out,
                *, n_regions: int, units: int, max_length: int):
    bt = pre_ref.shape[0]
    wdt = wxc_ref.dtype
    rid = jax.lax.broadcasted_iota(
        jnp.int32, (bt, pre_ref.shape[1]), 1)

    h0 = jnp.zeros((bt, units), jnp.float32)
    hst_out[:, 0, :] = h0
    cst_out[:, 0, :] = h0

    def step(t, carry):
        h, c = carry
        hw = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
        s = jnp.tanh(pre_ref[:] + (hw + b2_ref[0])[:, None, :])
        e = jnp.sum(s * v_ref[0][None, None, :], axis=-1) + bv_ref[0, 0]
        e = jnp.where(rid < n_regions, e, -1e30)
        e = e - jnp.max(e, axis=1, keepdims=True)
        w = jnp.exp(e)
        alpha = w / jnp.sum(w, axis=1, keepdims=True)
        alpha_out[:, t, :] = alpha
        ctx = jnp.sum(alpha[:, :, None] * feat_ref[:], axis=1)

        # x = [ctx; emb] @ Wx done as two dots — Mosaic cannot concat
        # vectors with mismatched lane layouts, and the split is free math
        z = (jnp.dot(ctx.astype(wdt), wxc_ref[:],
                     preferred_element_type=jnp.float32)
             + jnp.dot(emb_ref[:, t, :].astype(wdt), wxe_ref[:],
                       preferred_element_type=jnp.float32)
             + jnp.dot(h.astype(wdt), wh_ref[:],
                       preferred_element_type=jnp.float32)
             + b_ref[0])
        i, f, g, o = _gates(z, units)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        hseq_out[:, t, :] = h
        hst_out[:, t + 1, :] = h
        cst_out[:, t + 1, :] = c
        return h, c

    jax.lax.fori_loop(0, max_length, step, (h0, h0))


def _bwd_kernel(pre_ref, feat_ref, emb_ref, w2_ref, b2_ref, v_ref, bv_ref,
                wxc_ref, wxe_ref, wh_ref, b_ref, alpha_ref, hst_ref, cst_ref,
                ghseq_ref, galpha_ref,
                gpre_out, gfeat_out, gemb_out, gb2_out, gv_out,
                gbv_out, dz_out, dhw_out,
                *, n_regions: int, units: int, max_length: int,
                total_b: int):
    bt = pre_ref.shape[0]
    wdt = wxc_ref.dtype

    # ragged last tile: out-of-range block rows are clamped duplicates (TPU)
    # or uninitialised/NaN (interpret mode) — either way they must not reach
    # the gradient outputs. Zero every loaded row (NaN-safe jnp.where).
    row = jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0)
    valid = row + pl.program_id(0) * bt < total_b          # (bt, 1) bool
    v3 = valid[:, :, None]
    zero = jnp.float32(0.0)
    pre_l = jnp.where(v3, pre_ref[:], zero)
    feat_l = jnp.where(v3, feat_ref[:], zero)

    rid = jax.lax.broadcasted_iota(
        jnp.int32, (bt, pre_ref.shape[1]), 1)
    region_mask = (rid < n_regions).astype(jnp.float32)

    # the fori_loop (vs python unroll) keeps one body's register pressure;
    # the (Bt,R,·) accumulators live in the output refs (VMEM), updated
    # in place per step
    gpre_out[:] = jnp.zeros(pre_ref.shape, jnp.float32)
    gfeat_out[:] = jnp.zeros(feat_ref.shape, jnp.float32)
    gb2_out[0] = jnp.zeros((1, w2_ref.shape[1]), jnp.float32)
    gv_out[0] = jnp.zeros((1, v_ref.shape[1]), jnp.float32)
    gbv_out[0] = jnp.zeros((1, 1), jnp.float32)

    def step(k, carry):
        gh, gc = carry
        t = max_length - 1 - k
        h_t = jnp.where(valid, hst_ref[:, t, :], zero)
        c_t = jnp.where(valid, cst_ref[:, t, :], zero)
        c_next = jnp.where(valid, cst_ref[:, t + 1, :], zero)
        alpha = jnp.where(valid, alpha_ref[:, t, :], zero)
        emb_t = jnp.where(valid, emb_ref[:, t, :], zero)

        # ---- recompute the step's forward intermediates ----
        hw = jnp.dot(h_t, w2_ref[:], preferred_element_type=jnp.float32)
        s = jnp.tanh(pre_l + (hw + b2_ref[0])[:, None, :])
        ctx = jnp.sum(alpha[:, :, None] * feat_l, axis=1)
        z = (jnp.dot(ctx.astype(wdt), wxc_ref[:],
                     preferred_element_type=jnp.float32)
             + jnp.dot(emb_t.astype(wdt), wxe_ref[:],
                       preferred_element_type=jnp.float32)
             + jnp.dot(h_t.astype(wdt), wh_ref[:],
                       preferred_element_type=jnp.float32)
             + b_ref[0])
        i, f, g, o = _gates(z, units)
        tc = jnp.tanh(c_next)

        # ---- LSTM backward ----
        dh_raw = gh + jnp.where(valid, ghseq_ref[:, t, :], zero)
        do = dh_raw * tc
        dc_total = gc + dh_raw * o * (1.0 - tc * tc)
        df = dc_total * c_t
        di = dc_total * g
        dg = dc_total * i
        gc = dc_total * f
        dz = jnp.concatenate([
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do * o * (1.0 - o),
        ], axis=-1)                                   # (Bt, 4U)
        dz_out[:, t, :] = dz
        dctx = jnp.dot(dz.astype(wdt), wxc_ref[:].T,
                       preferred_element_type=jnp.float32)
        gemb_out[:, t, :] = jnp.dot(dz.astype(wdt), wxe_ref[:].T,
                                    preferred_element_type=jnp.float32)
        gh_lstm = jnp.dot(dz.astype(wdt), wh_ref[:].T,
                          preferred_element_type=jnp.float32)

        # ---- attention backward ----
        dalpha = jnp.sum(feat_l * dctx[:, None, :], axis=-1)
        dalpha = dalpha + jnp.where(valid, galpha_ref[:, t, :], zero)
        gfeat_out[:] += alpha[:, :, None] * dctx[:, None, :]
        de = alpha * (dalpha - jnp.sum(alpha * dalpha, axis=1, keepdims=True))
        de = de * region_mask
        gbv_out[0] += jnp.sum(de)[None, None]
        ds = de[:, :, None] * v_ref[0][None, None, :]
        gv_out[0] += jnp.sum(s * de[:, :, None], axis=(0, 1))[None, :]
        dtanh = ds * (1.0 - s * s)
        gpre_out[:] += dtanh
        gb2_out[0] += jnp.sum(dtanh, axis=(0, 1))[None, :]
        dhw = jnp.sum(dtanh, axis=1)                  # (Bt, A)
        dhw_out[:, t, :] = dhw
        gh_attn = jnp.dot(dhw, w2_ref[:].T,
                          preferred_element_type=jnp.float32)

        return gh_lstm + gh_attn, gc

    z0 = jnp.zeros((bt, units), jnp.float32)
    jax.lax.fori_loop(0, max_length, step, (z0, z0))


def _specs(bt, shapes_batched, shapes_full, n_extra_grid_outs=0):
    batched = lambda width: pl.BlockSpec(
        (bt,) + width, lambda i: (i,) + (0,) * len(width),
        memory_space=pltpu.VMEM,
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    tiled = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    return batched, full, tiled


def _pallas_fwd(pre, feat, emb, w2, b2r, vr, bvr, wxc, wxe, wh, br,
                n_regions, units, max_length, batch_tile, interpret):
    B, Rp, A = pre.shape
    bt = min(batch_tile, B)
    grid = (pl.cdiv(B, bt),)
    batched, full, _ = _specs(bt, None, None)
    kernel = functools.partial(_fwd_kernel, n_regions=n_regions, units=units,
                               max_length=max_length)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            batched(pre.shape[1:]), batched(feat.shape[1:]),
            batched(emb.shape[1:]),
            full(w2.shape), full(b2r.shape), full(vr.shape), full(bvr.shape),
            full(wxc.shape), full(wxe.shape), full(wh.shape), full(br.shape),
        ],
        out_specs=(
            batched((max_length, units)),
            batched((max_length, Rp)),
            batched((max_length + 1, units)),
            batched((max_length + 1, units)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, max_length, units), jnp.float32),
            jax.ShapeDtypeStruct((B, max_length, Rp), jnp.float32),
            jax.ShapeDtypeStruct((B, max_length + 1, units), jnp.float32),
            jax.ShapeDtypeStruct((B, max_length + 1, units), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pre, feat, emb, w2, b2r, vr, bvr, wxc, wxe, wh, br)


def _pallas_bwd(pre, feat, emb, w2, b2r, vr, bvr, wxc, wxe, wh, br,
                alphas, hst, cst, ghseq, galphas,
                n_regions, units, max_length, batch_tile, interpret):
    B, Rp, A = pre.shape
    D = feat.shape[2]
    E = emb.shape[2]
    bt = min(batch_tile, B)
    ntiles = pl.cdiv(B, bt)
    grid = (ntiles,)
    batched, full, tiled = _specs(bt, None, None)
    kernel = functools.partial(_bwd_kernel, n_regions=n_regions, units=units,
                               max_length=max_length, total_b=B)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            batched(pre.shape[1:]), batched(feat.shape[1:]),
            batched(emb.shape[1:]),
            full(w2.shape), full(b2r.shape), full(vr.shape), full(bvr.shape),
            full(wxc.shape), full(wxe.shape), full(wh.shape), full(br.shape),
            batched(alphas.shape[1:]), batched(hst.shape[1:]),
            batched(cst.shape[1:]),
            batched(ghseq.shape[1:]), batched(galphas.shape[1:]),
        ],
        out_specs=(
            batched((Rp, A)),                 # gpre
            batched((Rp, D)),                 # gfeat
            batched((max_length, E)),         # gemb
            tiled((1, A)),                    # gb2 (per tile)
            tiled((1, A)),                    # gv
            tiled((1, 1)),                    # gbv
            batched((max_length, 4 * units)),  # dz stack
            batched((max_length, A)),          # dhw stack
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Rp, A), jnp.float32),
            jax.ShapeDtypeStruct((B, Rp, D), jnp.float32),
            jax.ShapeDtypeStruct((B, max_length, E), jnp.float32),
            jax.ShapeDtypeStruct((ntiles, 1, A), jnp.float32),
            jax.ShapeDtypeStruct((ntiles, 1, A), jnp.float32),
            jax.ShapeDtypeStruct((ntiles, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, max_length, 4 * units), jnp.float32),
            jax.ShapeDtypeStruct((B, max_length, A), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pre, feat, emb, w2, b2r, vr, bvr, wxc, wxe, wh, br,
      alphas, hst, cst, ghseq, galphas)
    (gpre, gfeat, gemb, gb2_t, gv_t, gbv_t, dz, dhw) = outs
    # weight-gradient contractions over (B*T) rows in XLA (MXU-friendly
    # big matmuls; the kernel owns only the sequential chain)
    T = max_length
    region_ok = (jnp.arange(Rp) < n_regions)[None, None, :]
    ctx = jnp.einsum("btr,brd->btd", alphas * region_ok, feat,
                     preferred_element_type=jnp.float32)
    DZ = dz.reshape(B * T, -1)
    gwxc = ctx.reshape(B * T, -1).T @ DZ
    gwxe = emb.reshape(B * T, -1).T @ DZ
    HT = hst[:, :T, :].reshape(B * T, -1)
    gwh = HT.T @ DZ
    gw2 = HT.T @ dhw.reshape(B * T, -1)
    gb = DZ.sum(axis=0)
    gwx = jnp.concatenate([gwxc, gwxe], axis=0)
    return (gpre, gfeat, gemb,
            gw2, gb2_t.sum(0)[0], gv_t.sum(0)[0],
            gbv_t.sum(), gwx, gwh, gb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def fused_rnn(pre, feat, emb, w2, b2, v, bv, wx, wh, b,
              n_regions: int, units: int, max_length: int,
              batch_tile: int = 8):
    """(hseq (B,T,U), alphas (B,T,Rp)) — differentiable via hand-written
    Pallas backward. Region axis of pre/feat must be pre-padded
    (``pad_regions``)."""
    out, _ = _fused_rnn_fwd(pre, feat, emb, w2, b2, v, bv, wx, wh, b,
                            n_regions, units, max_length, batch_tile)
    return out


def _prep(b2, v, bv, b):
    return (b2.reshape(1, -1), v.reshape(1, -1),
            jnp.asarray(bv, jnp.float32).reshape(1, 1), b.reshape(1, -1))


def _fused_rnn_fwd(pre, feat, emb, w2, b2, v, bv, wx, wh, b,
                   n_regions, units, max_length, batch_tile):
    interpret = jax.default_backend() != "tpu"
    b2r, vr, bvr, br = _prep(b2, v, bv, b)
    D = feat.shape[2]
    wxc, wxe = wx[:D], wx[D:]
    hseq, alphas, hst, cst = _pallas_fwd(
        pre, feat, emb, w2, b2r, vr, bvr, wxc, wxe, wh, br,
        n_regions, units, max_length, batch_tile, interpret)
    residuals = (pre, feat, emb, w2, b2r, vr, bvr, wxc, wxe, wh, br,
                 alphas, hst, cst)
    return (hseq, alphas), residuals


def _fused_rnn_bwd(n_regions, units, max_length, batch_tile, residuals, cts):
    ghseq, galphas = cts
    (pre, feat, emb, w2, b2r, vr, bvr, wxc, wxe, wh, br,
     alphas, hst, cst) = residuals
    interpret = jax.default_backend() != "tpu"
    (gpre, gfeat, gemb, gw2, gb2, gv, gbv, gwx, gwh, gb) = _pallas_bwd(
        pre, feat, emb, w2, b2r, vr, bvr, wxc, wxe, wh, br,
        alphas, hst, cst, ghseq, galphas,
        n_regions, units, max_length, batch_tile, interpret)
    return (gpre, gfeat, gemb, gw2, gb2, gv, gbv, gwx, gwh, gb)


fused_rnn.defvjp(_fused_rnn_fwd, _fused_rnn_bwd)
