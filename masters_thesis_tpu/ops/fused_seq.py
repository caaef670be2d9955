"""The north-star fused TRAIN-side sequence step (round 5).

BASELINE.json's north star asks for "one fused attention+LSTM-cell step
shared by the teacher-forced train loop and the greedy/beam decode loop"
(reference hot loop: AttemptFour/Model/lc_NIC.py:223-263). The decode half
shipped in round 3 (ops/fused_decode.py — the whole-decode Pallas kernel).
This module is the TRAIN half: the whole teacher-forced attention+LSTM
sequence as one fused unit with a **custom VJP**, measured against the XLA
scan (scripts/fused_seq_probe.py; results in PERF.md).

Two forward backends share one hand-written backward:

- ``backend='xla'``  — a lax.scan forward that stores exactly the residuals
  the custom backward needs (h, c, alpha, the gate pre-activations z and
  the attention-query pre-activations hw).
- ``backend='pallas'`` — a whole-sequence Pallas TPU kernel: grid
  (batch-tiles, T), the (h, c) carry lives in VMEM scratch across the T
  grid steps, weights stay VMEM-resident, residuals stream out per step.

Why a custom VJP at all: XLA's autodiff of ``nn.scan`` carries every
broadcast-parameter gradient (dWx, dWh, dW2, dv, ...) through the backward
loop as HBM-resident accumulators — each step reads+writes the full
accumulator set AND issues batch-thin (B-row) weight-grad matmuls that
underfill the MXU (the flagship's matmuls are already ~1/8 tile wide,
PERF.md MFU ladder). The custom backward instead:

  1. scans t = T-1..0 carrying ONLY (dh, dc) plus the data-sized
     dfeatures/dpre accumulators, emitting stacked per-step locals
     (dz, dhw_pre, demb);
  2. computes every weight gradient AFTER the scan as one (B*T)-row
     einsum — 15x taller matmuls, no in-loop accumulator traffic.

The head (dense_inter/dense_out) and the loss stay in XLA: they are
already computed over the full (B, T, U) block outside the reference's
per-step loop (models/nic.py:205-207), so their gradients are already
batched-tall; fusing them into the kernel would *reintroduce* per-step
thin matmuls. Likewise ``pre = act(features @ W1 + b1)`` is loop-invariant
and stays an XLA matmul outside; d_pre flows back through it automatically.

Scope: the LSTM / zero-init / trainable-embedding family (the flagship),
eval-mode numerics (no dropout) — the structural measurement the round-4
verdict asked for. Gradients parity-tested against jax.grad of the
production scan (tests/test_fused_seq.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lrelu(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _dlrelu(x, slope):
    return jnp.where(x >= 0, 1.0, slope)


def _sig(x):
    return jax.nn.sigmoid(x)


# --------------------------------------------------------------- forward

def _attn_mask(key, t, shape, rate):
    """Per-step inverted-dropout scale mask for the attention scores
    (reference applies Dropout AFTER the tanh, attention.py:25-44).
    Regenerated — never stored — from fold_in(key, t) in BOTH the forward
    and the custom backward, so training-mode support costs no residual
    traffic (a stored (B, T, R, A) mask would be the largest tensor in the
    whole step)."""
    keep = 1.0 - rate
    m = jax.random.bernoulli(jax.random.fold_in(key, t), keep, shape)
    return m.astype(jnp.float32) / keep


def _mm(a, b, cdt):
    """Matmul with operands in the compute dtype and fp32 accumulation —
    the TPU-native mixed-precision shape (bf16 inputs fill the MXU's fast
    path; preferred_element_type keeps z/carries fp32)."""
    if cdt == jnp.float32:
        return a @ b
    return jnp.matmul(a.astype(cdt), b.astype(cdt),
                      preferred_element_type=jnp.float32)


def _ein(spec, a, b, cdt):
    if cdt == jnp.float32:
        return jnp.einsum(spec, a, b)
    return jnp.einsum(spec, a.astype(cdt), b.astype(cdt),
                      preferred_element_type=jnp.float32)


def _step_math(h, c, pre_t, features, emb_t, w, attn_slope,
               attn_dropout=0.0, key=None, t=None, cdt=jnp.float32):
    """One attention+LSTM step (lc_NIC semantics, nic.py:182-196).
    Returns (h', c', alpha, z, hw_pre)."""
    U = h.shape[-1]
    hw_pre = _mm(h, w["w2"], cdt) + w["b2"]             # (B, A)
    hw = _lrelu(hw_pre, attn_slope)
    s = jnp.tanh(pre_t + hw[:, None, :])                # (B, R, A)
    if attn_dropout > 0.0:
        s = s * _attn_mask(key, t, s.shape, attn_dropout)
    e = jnp.einsum("bra,a->br", s, w["v"]) + w["bv"]
    alpha = jax.nn.softmax(e, axis=1)                   # (B, R)
    ctx = _ein("br,brd->bd", alpha, features, cdt)
    x = jnp.concatenate([ctx, emb_t.astype(ctx.dtype)], axis=-1)
    z = _mm(x, w["wx"], cdt) + _mm(h, w["wh"], cdt) + w["b"]  # (B, 4U)
    i = _sig(z[:, :U])
    f = _sig(z[:, U:2 * U])
    g = jnp.tanh(z[:, 2 * U:3 * U])
    o = _sig(z[:, 3 * U:])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new, alpha, z, hw_pre


def _forward_xla(w, pre, features, emb, attn_slope, attn_dropout=0.0,
                 key=None, cdt=jnp.float32):
    """lax.scan forward storing the custom backward's residuals."""
    B, T, _ = emb.shape
    U = w["wh"].shape[0]
    h0 = jnp.zeros((B, U), jnp.float32)

    def body(carry, inp):
        h, c = carry
        t, emb_t = inp
        h2, c2, alpha, z, hwp = _step_math(
            h, c, pre, features, emb_t, w, attn_slope,
            attn_dropout=attn_dropout, key=key, t=t, cdt=cdt)
        return (h2, c2), (h2, c2, alpha, z, hwp)

    _, (hseq, cseq, alphas, zs, hwps) = jax.lax.scan(
        body, (h0, h0), (jnp.arange(T), jnp.swapaxes(emb, 0, 1)))
    # scan stacks on axis 0 = time; move batch first
    to_bt = lambda x: jnp.swapaxes(x, 0, 1)
    return tuple(map(to_bt, (hseq, cseq, alphas, zs, hwps)))


# --------------------------------------------------------------- pallas fwd

def _seq_kernel(pre_ref, feat_ref, emb_ref, w2_ref, b2_ref, v_ref, bv_ref,
                wx_ref, wh_ref, b_ref,
                h_out, c_out, alpha_out, z_out, hwp_out,
                h_scr, c_scr,
                *, n_regions: int, units: int, attn_slope: float):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h = h_scr[:]
    c = c_scr[:]

    # attention (pre = act(features @ W1 + b1) computed outside, invariant)
    hw_pre = (jnp.dot(h.astype(w2_ref.dtype), w2_ref[:],
                      preferred_element_type=jnp.float32) + b2_ref[0])
    hw = jnp.where(hw_pre >= 0, hw_pre, attn_slope * hw_pre)
    s = jnp.tanh(pre_ref[:] + hw[:, None, :])
    e = jnp.sum(s * v_ref[0][None, None, :], axis=-1) + bv_ref[0, 0]
    rid = jax.lax.broadcasted_iota(jnp.int32, e.shape, 1)
    e = jnp.where(rid < n_regions, e, -1e30)
    e = e - jnp.max(e, axis=1, keepdims=True)
    ew = jnp.exp(e)
    alpha = ew / jnp.sum(ew, axis=1, keepdims=True)
    ctx = jnp.sum(alpha[:, :, None] * feat_ref[:], axis=1)

    # LSTM cell (gate order i,f,g,o — models/lstm.py:47-49)
    emb_t = emb_ref[0]
    x = jnp.concatenate([ctx, emb_t.astype(ctx.dtype)], axis=-1)
    wdt = wx_ref.dtype
    z = (jnp.dot(x.astype(wdt), wx_ref[:],
                 preferred_element_type=jnp.float32)
         + jnp.dot(h.astype(wdt), wh_ref[:],
                   preferred_element_type=jnp.float32)
         + b_ref[0])
    i = jax.nn.sigmoid(z[:, :units])
    f = jax.nn.sigmoid(z[:, units:2 * units])
    g = jnp.tanh(z[:, 2 * units:3 * units])
    o = jax.nn.sigmoid(z[:, 3 * units:])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)

    h_scr[:] = h_new
    c_scr[:] = c_new
    # stepped outputs are TIME-MAJOR (T, B, ·): TPU block shapes need their
    # last two dims divisible by (8, 128) or equal to the array dims — a
    # batch-major (bt, 1, ·) block violates the sublane rule
    h_out[0] = h_new
    c_out[0] = c_new
    alpha_out[0] = alpha
    z_out[0] = z
    hwp_out[0] = hw_pre


def _forward_pallas(w, pre, features, emb, attn_slope,
                    batch_tile: int = 64, cdt=jnp.float32):
    """Whole-sequence Pallas forward. Grid (batch_tiles, T): t iterates
    fastest, so the (h, c) VMEM scratch carries across timesteps of one
    batch tile, then resets (@t==0) for the next. Weights are VMEM-resident
    with constant index maps; residuals stream out per (tile, t) block."""
    B, T, E = emb.shape
    R, A = pre.shape[1], pre.shape[2]
    D = features.shape[2]
    U = w["wh"].shape[0]

    # pad regions to the sublane multiple (alpha rows masked in-kernel)
    Rp = -(-R // 8) * 8
    if Rp != R:
        pad = ((0, 0), (0, Rp - R), (0, 0))
        pre = jnp.pad(pre, pad)
        features = jnp.pad(features, pad)

    bt = min(batch_tile, B)
    grid = (pl.cdiv(B, bt), T)
    on_tpu = jax.default_backend() == "tpu"
    # honor the requested compute dtype (bf16 weights only when asked for
    # AND on hardware that has the bf16 MXU path); fp32 stays fp32 so the
    # forward never runs below the precision the caller requested
    wdt = cdt if (on_tpu and cdt == jnp.bfloat16) else jnp.float32
    wx, wh, w2 = (w[k].astype(wdt) for k in ("wx", "wh", "w2"))
    b2r = w["b2"].reshape(1, -1)
    vr = w["v"].reshape(1, -1)
    bvr = jnp.asarray(w["bv"], jnp.float32).reshape(1, 1)
    br = w["b"].reshape(1, -1)

    inv = lambda width: pl.BlockSpec(          # per-tile, t-invariant
        (bt,) + width, lambda ib, t: (ib,) + (0,) * len(width),
        memory_space=pltpu.VMEM)
    # stepped tensors ride TIME-MAJOR (T, B, ·): block (1, bt, ·) keeps the
    # last two dims (bt, ·) on the TPU's (8, 128) tiling grid
    stepped = lambda width: pl.BlockSpec(
        (1, bt) + width, lambda ib, t: (t, ib) + (0,) * len(width),
        memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(
        shape, lambda ib, t: (0,) * len(shape), memory_space=pltpu.VMEM)

    emb_tm = jnp.swapaxes(emb, 0, 1)           # (T, B, E)
    kernel = functools.partial(
        _seq_kernel, n_regions=R, units=U, attn_slope=attn_slope)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            inv((Rp, A)), inv((Rp, D)), stepped((E,)),
            full(w2.shape), full(b2r.shape), full(vr.shape), full(bvr.shape),
            full(wx.shape), full(wh.shape), full(br.shape),
        ],
        out_specs=(
            stepped((U,)), stepped((U,)), stepped((Rp,)),
            stepped((4 * U,)), stepped((A,)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, U), jnp.float32),
            jax.ShapeDtypeStruct((T, B, U), jnp.float32),
            jax.ShapeDtypeStruct((T, B, Rp), jnp.float32),
            jax.ShapeDtypeStruct((T, B, 4 * U), jnp.float32),
            jax.ShapeDtypeStruct((T, B, A), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bt, U), jnp.float32),
            pltpu.VMEM((bt, U), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=not on_tpu,
    )(pre, features, emb_tm, w2, b2r, vr, bvr, wx, wh, br)
    hseq, cseq, alphas, zs, hwps = (jnp.swapaxes(o, 0, 1) for o in outs)
    return hseq, cseq, alphas[:, :, :R], zs, hwps


# --------------------------------------------------------------- backward

def _backward(w, pre, features, emb, residuals, dhseq, dalphas, attn_slope,
              attn_dropout=0.0, key=None, cdt=jnp.float32):
    """The shared custom backward: scan carries ONLY (dh, dc) (+ data-sized
    dfeat/dpre/dv accumulators); every weight gradient is one stacked
    (B*T)-row einsum after the scan."""
    hseq, cseq, alphas, zs, hwps = residuals
    B, T, U = hseq.shape
    D = features.shape[2]

    h_prev = jnp.concatenate(
        [jnp.zeros((B, 1, U), hseq.dtype), hseq[:, :-1]], axis=1)
    c_prev = jnp.concatenate(
        [jnp.zeros((B, 1, U), cseq.dtype), cseq[:, :-1]], axis=1)

    def body(carry, inp):
        dh_c, dc_c, dfeat, dpre, dv, dbv = carry
        (t_idx, dh_out, dalpha_out, cp, c_t, alpha, z, hwp) = inp
        pre_t = pre  # loop-invariant (B, R, A); closed over, not stacked
        dh = dh_out + dh_c

        # LSTM cell backward (recompute activations from stored z)
        i = _sig(z[:, :U]); f = _sig(z[:, U:2 * U])
        g = jnp.tanh(z[:, 2 * U:3 * U]); o = _sig(z[:, 3 * U:])
        tc = jnp.tanh(c_t)
        do = dh * tc
        dc = dc_c + dh * o * (1.0 - tc * tc)
        di = dc * g
        df = dc * cp
        dg = dc * i
        dc_prev = dc * f
        dz = jnp.concatenate([
            di * i * (1 - i), df * f * (1 - f),
            dg * (1 - g * g), do * o * (1 - o)], axis=-1)     # (B, 4U)
        dx = _mm(dz, w["wx"].T, cdt)
        dh_prev_rec = _mm(dz, w["wh"].T, cdt)
        dctx = dx[:, :D]
        demb_t = dx[:, D:]

        # attention backward (ctx and softmax; s recomputed from pre+hw,
        # the dropout mask regenerated from the same fold_in(key, t))
        dalpha = _ein("bd,brd->br", dctx, features, cdt) + dalpha_out
        dfeat = dfeat + alpha[:, :, None] * dctx[:, None, :]
        de = alpha * (dalpha - jnp.sum(alpha * dalpha, axis=1, keepdims=True))
        hw = _lrelu(hwp, attn_slope)
        s = jnp.tanh(pre_t + hw[:, None, :])                   # (B, R, A)
        if attn_dropout > 0.0:
            mask = _attn_mask(key, t_idx, s.shape, attn_dropout)
            s_used = s * mask
        else:
            mask = None
            s_used = s
        ds_used = de[:, :, None] * w["v"][None, None, :]
        dv = dv + jnp.einsum("bra,br->a", s_used, de)
        dbv = dbv + jnp.sum(de)
        ds = ds_used * mask if mask is not None else ds_used
        ds_pre = ds * (1.0 - s * s)
        dpre = dpre + ds_pre
        dhw = jnp.sum(ds_pre, axis=1)                          # (B, A)
        dhw_pre = dhw * _dlrelu(hwp, attn_slope)
        dh_prev_attn = _mm(dhw_pre, w["w2"].T, cdt)

        return ((dh_prev_rec + dh_prev_attn, dc_prev, dfeat, dpre, dv, dbv),
                (dz, dhw_pre, demb_t))

    A = w["v"].shape[0]
    R = features.shape[1]
    carry0 = (
        jnp.zeros((B, U), jnp.float32), jnp.zeros((B, U), jnp.float32),
        jnp.zeros((B, R, D), jnp.float32), jnp.zeros((B, R, A), jnp.float32),
        jnp.zeros((A,), jnp.float32), jnp.zeros((), jnp.float32),
    )
    # emb is NOT a scan input: demb falls out of dx inside the body and emb
    # itself is only needed post-scan (x_all) — streaming it through the
    # reverse scan would be a pure waste
    to_tb = lambda x: jnp.swapaxes(x, 0, 1)
    seq_inputs = (jnp.arange(T),) + tuple(map(to_tb, (
        dhseq, dalphas, c_prev, cseq, alphas, zs, hwps)))
    (dh0, _, dfeat, dpre, dv, dbv), (dz_t, dhwp_t, demb_t) = jax.lax.scan(
        body, carry0, seq_inputs, reverse=True)
    del dh0  # h0 is a constant zero
    dz_all = to_tb(dz_t)                                       # (B, T, 4U)
    dhwp_all = to_tb(dhwp_t)
    demb = to_tb(demb_t)

    # ---- stacked weight grads: one tall einsum each, no in-loop accums
    ctx_all = _ein("btr,brd->btd", alphas, features, cdt)
    x_all = jnp.concatenate([ctx_all, emb.astype(ctx_all.dtype)], axis=-1)
    dwx = _ein("btx,btz->xz", x_all, dz_all, cdt)
    dwh = _ein("btu,btz->uz", h_prev, dz_all, cdt)
    db = jnp.sum(dz_all, axis=(0, 1))
    dw2 = _ein("btu,bta->ua", h_prev, dhwp_all, cdt)
    db2 = jnp.sum(dhwp_all, axis=(0, 1))
    # dfeat also gets the context-sum contribution already accumulated;
    # the pre -> (W1, features) path is closed by XLA outside this VJP.
    dw = {"w2": dw2, "b2": db2, "v": dv, "bv": dbv,
          "wx": dwx, "wh": dwh, "b": db}
    return dw, dpre, dfeat, demb


# --------------------------------------------------------------- public api

def make_fused_sequence(attn_slope: float = 0.2, backend: str = "xla",
                        batch_tile: int = 64, attn_dropout: float = 0.0,
                        compute_dtype=jnp.float32):
    """Returns the fused sequence step with the custom VJP. ``w``: dict with
    attention (w2, b2, v, bv) and LSTM (wx, wh, b) arrays —
    ``extract_seq_params``. The caller supplies
    ``pre = act(features @ W1 + b1)`` and the embedded tokens, and applies
    the vocab head + loss to ``hseq`` (their grads flow in via d_hseq).

    ``attn_dropout == 0``: ``seq(w, pre, features, emb) -> (hseq, alphas)``.
    ``attn_dropout > 0`` (training adoption): ``seq(w, pre, features, emb,
    key)`` — the per-step attention-score masks are regenerated from
    ``fold_in(key, t)`` in both passes (never stored; a different dropout
    stream than flax's nn.scan split, like tpu.prng_impl='rbg' is — the
    masks are iid Bernoulli either way). XLA backend only with dropout."""
    assert backend in ("xla", "pallas")
    if attn_dropout > 0.0:
        assert backend == "xla", (
            "the Pallas forward has no dropout path — training adoption "
            "uses the XLA forward (the measured winner; PERF.md round 5)")

        @jax.custom_vjp
        def seq_d(w, pre, features, emb, key):
            residuals = _forward_xla(w, pre, features, emb, attn_slope,
                                     attn_dropout=attn_dropout, key=key,
                                     cdt=compute_dtype)
            return residuals[0], residuals[2]

        def seq_d_fwd(w, pre, features, emb, key):
            residuals = _forward_xla(w, pre, features, emb, attn_slope,
                                     attn_dropout=attn_dropout, key=key,
                                     cdt=compute_dtype)
            return ((residuals[0], residuals[2]),
                    (w, pre, features, emb, key, residuals))

        def seq_d_bwd(saved, grads):
            w, pre, features, emb, key, residuals = saved
            dhseq, dalphas = grads
            dw, dpre, dfeat, demb = _backward(
                w, pre, features, emb, residuals, dhseq, dalphas,
                attn_slope, attn_dropout=attn_dropout, key=key,
                cdt=compute_dtype)
            return dw, dpre, dfeat, demb, None

        seq_d.defvjp(seq_d_fwd, seq_d_bwd)
        return seq_d

    fwd_impl = ((lambda w, p, f, e, s, batch_tile=64:
                 _forward_pallas(w, p, f, e, s, batch_tile=batch_tile,
                                 cdt=compute_dtype))
                if backend == "pallas" else
                (lambda w, p, f, e, s, batch_tile=None:
                 _forward_xla(w, p, f, e, s, cdt=compute_dtype)))

    @jax.custom_vjp
    def seq(w, pre, features, emb):
        hseq, cseq, alphas, zs, hwps = fwd_impl(
            w, pre, features, emb, attn_slope, batch_tile=batch_tile)
        return hseq, alphas

    def seq_fwd(w, pre, features, emb):
        residuals = fwd_impl(
            w, pre, features, emb, attn_slope, batch_tile=batch_tile)
        hseq, cseq, alphas, zs, hwps = residuals
        return (hseq, alphas), (w, pre, features, emb, residuals)

    def seq_bwd(saved, grads):
        w, pre, features, emb, residuals = saved
        dhseq, dalphas = grads
        return _backward(
            w, pre, features, emb, residuals, dhseq, dalphas, attn_slope,
            cdt=compute_dtype)

    seq.defvjp(seq_fwd, seq_bwd)
    return seq


def extract_seq_params(params: dict) -> dict:
    """Attention + LSTM weights from a NIC param tree (fp32 views)."""
    attn = params["attention"]
    return {
        "w2": attn["W2"]["kernel"], "b2": attn["W2"]["bias"],
        "v": attn["V"]["kernel"][:, 0], "bv": attn["V"]["bias"][0],
        "wx": params["lstm"]["kernel"],
        "wh": params["lstm"]["recurrent_kernel"],
        "b": params["lstm"]["bias"],
    }


def fused_train_supported(model, cfg) -> bool:
    """Can the production train step route through the fused sequence?
    The custom VJP implements the LSTM/zero-init teacher-forced loop with
    a trainable embedding table, fp32 compute (the production flagship
    configuration)."""
    from masters_thesis_tpu.models.nic import NIC

    return (
        isinstance(model, NIC)
        and model.cell_type == "lstm"
        and not model.learned_init_state
        and (model.pretrained_embedding is None or model.embedding_trainable)
        # remat exists to AVOID storing per-step activations; the custom
        # VJP stores five residual tensors per step with no recompute path
        # — honoring remat means falling back to the autodiff scan
        and not getattr(cfg.tpu, "remat", False)
    )


def _dropout(x, rate, key):
    if rate <= 0.0:
        return x
    keep = 1.0 - rate
    m = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(m, x / keep, 0.0)


def make_train_forward_loss(model, cfg, l2_rules):
    """The PRODUCTION training-mode forward+loss with the fused sequence
    inside — full semantics: every dropout site (input via encode, text on
    the embeddings, attention scores in the custom VJP, lstm output, head
    inter), BatchNorm stat mutation, L2 regularisers, the metric set.
    Drop-in for train.steps._forward_loss (same return contract) when
    ``cfg.tpu.fused_seq`` is on and ``fused_train_supported`` holds.

    Adoption basis (scripts/fused_seq_probe.py, PERF.md round 5): the
    custom backward is ~1.4x the XLA-autodiff scan at MXU-filling dims
    (53.3 -> 37.4 ms/step decoder fwd+bwd) and neutral-within-noise at the
    flagship batch-64 contract. Dropout masks ride a different (iid) stream
    than flax's per-step split — same caveat class as tpu.prng_impl."""
    from masters_thesis_tpu.models.common import leaky_relu, mask_padded_vocab
    from masters_thesis_tpu.train.losses import (
        accuracy,
        attention_loss,
        caption_loss,
        l2_loss,
    )

    assert fused_train_supported(model, cfg)
    attn_slope = 0.2 if model.attn_inner_activation == "leaky_relu" else 1.0
    rate_attn = float(model.dropout_attn)
    # mixed precision mirrors train.steps._compute_dtype: bf16 matmul
    # operands with fp32 accumulation on TPU; fp32 masters keep the grads
    from masters_thesis_tpu.train.steps import _compute_dtype

    cdt = _compute_dtype(cfg)
    seq = make_fused_sequence(attn_slope=attn_slope, backend="xla",
                              attn_dropout=rate_attn, compute_dtype=cdt)

    def head_act(x):
        if model.head_activation == "leaky_relu":
            return leaky_relu(x)
        if model.head_activation == "relu":
            return jax.nn.relu(x)
        return x

    def forward(params, batch_stats, rng, betas, tokens, target, mask=None):
        k_enc, k_text, k_attn, k_lstm, k_out = jax.random.split(rng, 5)
        fwd_params = params
        if cdt == jnp.bfloat16:
            # mirror train.steps._forward_loss: bf16 forward params, fp32
            # masters (the cast is differentiable; grads land on fp32)
            cast = lambda p: p.astype(cdt) if p.dtype == jnp.float32 else p
            fwd_params = jax.tree_util.tree_map(cast, params)
            betas = betas.astype(cdt)
        variables = {"params": fwd_params, "batch_stats": batch_stats}
        features, mutated = model.apply(
            variables, betas, True, method="encode",
            rngs={"dropout": k_enc}, mutable=["batch_stats"])
        new_stats = mutated.get("batch_stats", batch_stats)
        if cdt == jnp.bfloat16:
            new_stats = jax.tree_util.tree_map(
                lambda s: s.astype(jnp.float32), new_stats)
            # the fused sequence keeps its carries/residuals fp32; feed it
            # fp32 features/pre (its matmuls cast operands internally)
            features = features.astype(jnp.float32)
        w1 = fwd_params["attention"]["W1"]
        pre = _mm(features, w1["kernel"], cdt) + w1["bias"]
        if attn_slope != 1.0:
            pre = _lrelu(pre, attn_slope)
        emb = jnp.take(fwd_params["embedding"], tokens, axis=0).astype(
            jnp.float32)
        emb = _dropout(emb, model.dropout_text, k_text)
        w = extract_seq_params(fwd_params)
        if rate_attn > 0.0:
            hseq, alphas = seq(w, pre, features, emb, k_attn)
        else:
            hseq, alphas = seq(w, pre, features, emb)
        hseq = _dropout(hseq, model.dropout_lstm, k_lstm)
        hi = head_act(_mm(hseq, fwd_params["dense_inter"]["kernel"], cdt)
                      + fwd_params["dense_inter"]["bias"])
        hi = _dropout(hi, model.dropout_out, k_out)
        logits = _mm(hi, fwd_params["dense_out"]["kernel"], cdt) + (
            fwd_params["dense_out"]["bias"])
        logits = mask_padded_vocab(logits, model.true_vocab)

        cce = caption_loss(logits.astype(jnp.float32), target, mask)
        l2 = l2_loss(params, l2_rules)
        attn = attention_loss(alphas.astype(jnp.float32))
        total = cce + l2
        if cfg.attn_loss:
            total = total + attn
        metrics = {
            "loss": cce,
            "L2": l2,
            "attention": attn,
            "accuracy": accuracy(logits, target, mask),
        }
        return total, (metrics, new_stats)

    return forward


def make_fused_forward_loss(model, cfg, backend: str = "xla",
                            batch_tile: int = 64):
    """Eval-mode teacher-forced forward + masked-CCE loss with the fused
    sequence inside — the probe-side analogue of train.steps._forward_loss
    (minus dropout/BN mutation), differentiable end-to-end.

    ``fn(params, betas, tokens, target, batch_stats=None) -> loss``; the
    encoder, pre-matmul (attention W1), embedding gather, vocab head and
    loss stay XLA — their gradients close over the custom VJP's
    d_pre/d_features/d_emb/d_hseq.
    """
    from masters_thesis_tpu.models.common import leaky_relu, mask_padded_vocab
    from masters_thesis_tpu.train.losses import caption_loss

    assert model.cell_type == "lstm" and not model.learned_init_state
    slope = 0.2 if model.attn_inner_activation == "leaky_relu" else 1.0
    seq = make_fused_sequence(attn_slope=slope, backend=backend,
                              batch_tile=batch_tile)

    def fn(params, betas, tokens, target, batch_stats=None):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        features = model.apply(variables, betas, False, method="encode")
        w1 = params["attention"]["W1"]
        pre = features @ w1["kernel"] + w1["bias"]
        pre = _lrelu(pre, slope) if slope != 1.0 else pre
        emb = jnp.take(params["embedding"], tokens, axis=0)
        w = extract_seq_params(params)
        hseq, alphas = seq(w, pre, features, emb)
        hi = hseq @ params["dense_inter"]["kernel"] + (
            params["dense_inter"]["bias"])
        if model.head_activation == "leaky_relu":
            hi = leaky_relu(hi)
        logits = hi @ params["dense_out"]["kernel"] + (
            params["dense_out"]["bias"])
        logits = mask_padded_vocab(logits, model.true_vocab)
        return caption_loss(logits.astype(jnp.float32), target)

    return fn
