"""Jitted train / eval steps for the NIC family.

Reference train_step (lc_NIC.py:328-408) runs EAGERLY; here the whole step —
on-device beta gather (when the store is HBM-resident), forward (15-step
teacher-forced loop), loss, backward, Adam update, BatchNorm stat update — is
one compiled XLA program. SAM (lc_NIC.py:713-838, ThinkAndTell/model.py:167-233)
is a two-pass variant selected by ``cfg.sam_rho > 0``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from masters_thesis_tpu.ops.gather import gather_rows

from masters_thesis_tpu.train.losses import (
    accuracy,
    attention_loss,
    caption_loss,
    l2_loss,
)


def _compute_dtype(cfg):
    name = getattr(getattr(cfg, "tpu", None), "compute_dtype", "float32")
    # bf16 matmuls with fp32 accumulation are TPU-native; the CPU backend
    # lacks BF16xBF16=F32 dots, so fall back to fp32 off-TPU (tests)
    if name == "bfloat16" and jax.default_backend() == "tpu":
        return jnp.bfloat16
    return jnp.float32


def _forward_loss(model, cfg, l2_rules, params, batch_stats, rng, betas,
                  tokens, target, mask=None):
    # tpu.fused_seq: route the teacher-forced decoder through the fused
    # sequence step's custom VJP (ops/fused_seq.py — backward carries only
    # (dh, dc), weight grads become stacked (B*T)-row einsums; measured
    # ~1.4x the autodiff scan at MXU-filling dims, neutral at flagship
    # batch 64). Full training semantics: all dropout sites, BN mutation,
    # L2, metrics.
    if getattr(getattr(cfg, "tpu", None), "fused_seq", False):
        from masters_thesis_tpu.ops.fused_seq import (
            fused_train_supported,
            make_train_forward_loss,
        )

        if fused_train_supported(model, cfg):
            fwd = make_train_forward_loss(model, cfg, l2_rules)
            return fwd(params, batch_stats, rng, betas, tokens, target, mask)
    # mixed precision: master params fp32, forward in bf16 when configured
    # (the cast is differentiable; grads land back on the fp32 masters)
    cdt = _compute_dtype(cfg)
    fwd_params = params
    if cdt == jnp.bfloat16:
        cast = lambda p: p.astype(cdt) if p.dtype == jnp.float32 else p
        fwd_params = jax.tree_util.tree_map(cast, params)
        betas = betas.astype(cdt)
    a0 = jnp.zeros((betas.shape[0], cfg.units), betas.dtype)
    variables = {"params": fwd_params, "batch_stats": batch_stats}
    (logits, alphas), mutated = model.apply(
        variables,
        betas,
        tokens,
        a0,
        a0,
        training=True,
        rngs={"dropout": rng},
        mutable=["batch_stats"],
    )
    new_stats = mutated.get("batch_stats", batch_stats)
    if cdt == jnp.bfloat16:
        new_stats = jax.tree_util.tree_map(
            lambda s: s.astype(jnp.float32), new_stats
        )
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


def make_train_step(model, cfg, l2_rules, masked: bool = False,
                    donate: bool = True, jit: bool = True):
    """Returns jitted ``step(state, betas, tokens, target) -> (state, metrics)``.

    ``jit=False`` returns the raw python step (used by the sharded wrapper in
    parallel/sharding.py, which jits it with explicit in/out shardings)."""

    def loss_fn(params, state, rng, betas, tokens, target, mask):
        return _forward_loss(
            model, cfg, l2_rules, params, state.batch_stats, rng, betas,
            tokens, target, mask
        )

    def step(state, betas, tokens, target):
        mask = (target != 0) if masked else None
        rng = jax.random.fold_in(state.rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        if cfg.sam_rho > 0:
            # SAM: perturb by rho * g / ||g||_global, re-evaluate gradient
            (_, (_, _)), g1 = grad_fn(
                state.params, state, rng, betas, tokens, target, mask
            )
            gnorm = optax.global_norm(g1)
            scale = cfg.sam_rho / (gnorm + 1e-12)
            perturbed = jax.tree_util.tree_map(
                lambda p, g: p + g * scale, state.params, g1
            )
            (total, (metrics, new_stats)), grads = grad_fn(
                perturbed, state, rng, betas, tokens, target, mask
            )
        else:
            (total, (metrics, new_stats)), grads = grad_fn(
                state.params, state, rng, betas, tokens, target, mask
            )

        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        metrics["total"] = total
        metrics["grad_norm"] = optax.global_norm(grads)  # df_grads.csv analogue
        return new_state, metrics

    if not jit:
        return step
    donate_args = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def _eval_body(model, cfg, l2_rules, masked):
    """Inference-mode forward + the reference's val metric set
    (lc_NIC.test_step :410-459) — shared by the per-batch eval step and the
    scanned one-call validation pass so their numerics cannot drift."""

    def body(state, betas, tokens, target):
        mask = (target != 0) if masked else None
        a0 = jnp.zeros((betas.shape[0], cfg.units), betas.dtype)
        logits, alphas = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            betas,
            tokens,
            a0,
            a0,
            training=False,
        )
        return {
            "loss": caption_loss(logits, target, mask),
            "L2": l2_loss(state.params, l2_rules),
            "attention": attention_loss(alphas),
            "accuracy": accuracy(logits, target, mask),
        }

    return body


def make_eval_step(model, cfg, l2_rules, masked: bool = False):
    """Validation step: forward in inference mode, same loss composition,
    no update."""
    return jax.jit(_eval_body(model, cfg, l2_rules, masked))


def make_scanned_eval_steps_from_tables(model, cfg, l2_rules,
                                        masked: bool = False,
                                        store_width: int | None = None,
                                        store_packed: bool | None = None):
    """Whole-validation-pass-in-one-call eval: ``lax.scan`` over the val
    epoch's (K, B) pair permutation with the token/target/store-index tables
    device-resident, mirroring make_scanned_train_steps_from_tables. The
    per-batch val loop issued ~2 dispatches per batch (store gather + eval
    step) plus token transfers — seconds per epoch of pure host latency on a
    tunneled runtime. Returns stacked metrics (K, ...) — same values as
    make_eval_step on each batch."""

    eval_body = _eval_body(model, cfg, l2_rules, masked)

    def steps(state, store, store_idx, tokens, target, pair_idx):
        def body(carry, pidx):
            idx_ = jnp.take(store_idx, pidx, axis=0)
            tok_ = jnp.take(tokens, pidx, axis=0)
            tgt_ = jnp.take(target, pidx, axis=0)
            betas = gather_rows(store, idx_, width=store_width,
                                packed=store_packed)
            return carry, eval_body(state, betas, tok_, tgt_)

        return jax.lax.scan(body, 0, pair_idx)[1]

    return jax.jit(steps)


def make_grad_stats_fn(model, cfg, l2_rules, masked: bool = False):
    """Per-parameter gradient statistics on one batch — the reference dumps
    these to ``df_grads.csv`` at train end (AttemptFour/main.py:359-361).
    Returns ``fn(state, betas, tokens, target) -> {param_path: (norm, mean_abs,
    max_abs)}`` with '/'-joined flax paths, computed in one jitted call."""

    def loss_fn(params, state, rng, betas, tokens, target, mask):
        return _forward_loss(
            model, cfg, l2_rules, params, state.batch_stats, rng, betas,
            tokens, target, mask
        )

    @jax.jit
    def stats(state, betas, tokens, target):
        mask = (target != 0) if masked else None
        rng = jax.random.fold_in(state.rng, state.step)
        _, grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, rng, betas, tokens, target, mask
        )
        return jax.tree_util.tree_map(
            lambda g: jnp.stack(
                [jnp.sqrt(jnp.sum(jnp.square(g))), jnp.mean(jnp.abs(g)),
                 jnp.max(jnp.abs(g))]
            ),
            grads,
        )

    def fn(state, betas, tokens, target):
        tree = stats(state, betas, tokens, target)
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        out = {}
        for path, v in flat:
            name = "/".join(
                getattr(k, "key", getattr(k, "name", str(k))) for k in path
            )
            v = jax.device_get(v)
            out[name] = (float(v[0]), float(v[1]), float(v[2]))
        return out

    return fn


def _scan_step_body(model, cfg, l2_rules, masked, store_width, store_packed):
    """One optimisation step as used inside the scanned trainers:
    ``one(state, store, idx_, tok_, tgt_) -> (new_state, metrics)`` with the
    beta gather from the HBM store inside."""

    def one(state, store, idx_, tok_, tgt_):
        # honours both store layouts: 2D jnp.take or the packed
        # (N, S, 128) Pallas DMA gather (ops/gather.py — the probed
        # 5.8x row-fetch win that dominated the step)
        betas = gather_rows(store, idx_, width=store_width,
                            packed=store_packed)
        mask = (tgt_ != 0) if masked else None
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            return _forward_loss(
                model, cfg, l2_rules, params, state.batch_stats, rng,
                betas, tok_, tgt_, mask
            )

        if cfg.sam_rho > 0:
            # SAM two-pass (model.py:167-233 semantics), same as the
            # per-dispatch step
            _, g1 = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            scale = cfg.sam_rho / (optax.global_norm(g1) + 1e-12)
            perturbed = jax.tree_util.tree_map(
                lambda p, g: p + g * scale, state.params, g1
            )
            (total, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(perturbed)
        else:
            (total, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=new_stats
        )
        metrics["total"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return one


def make_scanned_train_steps(model, cfg, l2_rules, masked: bool = False,
                             store_width: int | None = None,
                             jit: bool = True,
                             store_packed: bool | None = None):
    """Multi-step trainer: ONE device call runs K optimisation steps via
    ``lax.scan`` over stacked index/token batches, gathering betas from the
    HBM-resident store inside the loop.

    With the store on device, an entire epoch's host traffic is a few KB of
    int32 ids — the host dispatch overhead (significant over a tunneled TPU,
    and nonzero everywhere) is amortised to one call. Returns stacked
    per-step metrics (K, ...).

    ``steps(state, store, idx (K,B), tokens (K,B,T), target (K,B,T))``.
    ``jit=False`` returns the raw python body (the sharded wrapper in
    parallel/sharding.py jits it with explicit in/out shardings)."""

    one = _scan_step_body(model, cfg, l2_rules, masked, store_width,
                          store_packed)

    def steps(state, store, idx, tokens, target):
        def body(state, batch):
            idx_, tok_, tgt_ = batch
            return one(state, store, idx_, tok_, tgt_)

        return jax.lax.scan(body, state, (idx, tokens, target))

    if not jit:
        return steps
    return jax.jit(steps, donate_argnums=(0,))


def make_scanned_train_steps_from_tables(model, cfg, l2_rules,
                                         masked: bool = False,
                                         store_width: int | None = None,
                                         jit: bool = True,
                                         store_packed: bool | None = None):
    """Scanned trainer whose token/target/store-index TABLES are
    device-resident: the host ships only the epoch's (K, B) pair permutation
    (int32, ~KB) per device call instead of stacked token/target tensors
    (~MB/epoch at flagship shape — measurably the whole integrated-trainer
    gap vs bench over a tunneled runtime, and pure overhead everywhere).
    The per-step batch (store row ids, input tokens, shifted targets) is
    gathered from the tables INSIDE the scan.

    ``steps(state, store, store_idx (N,), tokens (N,T), target (N,T),
    pair_idx (K,B))`` — tables indexed by pair id; numerics identical to
    :func:`make_scanned_train_steps` on the equivalent stacked batches."""

    one = _scan_step_body(model, cfg, l2_rules, masked, store_width,
                          store_packed)

    def steps(state, store, store_idx, tokens, target, pair_idx):
        def body(state, pidx):
            idx_ = jnp.take(store_idx, pidx, axis=0)
            tok_ = jnp.take(tokens, pidx, axis=0)
            tgt_ = jnp.take(target, pidx, axis=0)
            return one(state, store, idx_, tok_, tgt_)

        return jax.lax.scan(body, state, pair_idx)

    if not jit:
        return steps
    return jax.jit(steps, donate_argnums=(0,))


def make_gathered_train_step(model, cfg, l2_rules, masked: bool = False,
                             store_width: int | None = None,
                             store_packed: bool | None = None):
    """Train step taking (state, store, idx, tokens, target): the beta rows
    are gathered from the HBM-resident store INSIDE the compiled step, so the
    host only ships ~KB of token ids per step."""
    @partial(jax.jit, donate_argnums=(0,))
    def step(state, store, idx, tokens, target):
        betas = gather_rows(store, idx, width=store_width,
                            packed=store_packed)
        mask = (target != 0) if masked else None
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            return _forward_loss(
                model, cfg, l2_rules, params, state.batch_stats, rng, betas,
                tokens, target, mask
            )

        (total, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        metrics["total"] = total
        return new_state, metrics

    return step
