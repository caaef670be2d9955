"""Decompose the scaled-trainer MFU gap (mfu_ceiling_probe rung 3 vs 2).

At MXU-friendly dims (units 2048 / groups of 128 / head 2048 / vocab 8192 /
batch 256) the bare 15-step recurrence fwd+bwd reaches ~54 TF/s (27.6% of
a v5e's bf16 peak) but the full production scanned trainer lands ~21 TF/s
(10.7%). This probe isolates where the remaining 2.6x goes, decomp_probe2
style (per-component K-step scans on the chip, grads tied to the loop
index so LICM cannot hoist a loop-invariant body — the PERF.md pitfall):

  - Pallas store gather alone
  - encoder fwd+bwd (+gather)
  - decoder-only fwd+bwd (attention + LSTM + head over fixed features,
    input varied per iteration)
  - full model fwd+bwd (+gather)
  - the production loss gradient WITHOUT the optimizer (training-mode
    extras: BN stats, dropout rngs, metrics)
  - the bare loss WITH the Adam update (optimizer + state-carry cost)
  - the production scanned step in fp32/bf16 and with dropout / clipnorm+L2
    knocked out

Findings (PERF.md "MFU ladder" section): the decoder fwd+bwd dominates
(~48 of 70 ms); optimizer+regularisers cost ≤4 ms combined. A second
measurement trap joined the LICM one: component rows must reduce over the
ENTIRE gradient tree (``_consume``) — consuming one leaf lets XLA
dead-code-eliminate the other weight-grad matmuls and the embedding
scatter (28.6 ms vs the honest 48.3 ms for the decoder row).

Prints ms/step per component and writes artifacts/mfu_scaled_decomp.json.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E402,E702
import dataclasses
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
if jax.default_backend() == "tpu":
    jax.config.update("jax_default_prng_impl", "rbg")

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_groups
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.gather import gather_rows
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.train.losses import lc_nic_l2_rules
from masters_thesis_tpu.train.optim import make_optimizer
from masters_thesis_tpu.train.state import TrainState, init_model
from masters_thesis_tpu.train.steps import make_scanned_train_steps

cfg = Config()
cfg.units = 2048
cfg.attn_units = 256
cfg.group_size = 128
cfg.embedding_text = 1024
cfg.top_k = 8191
cfg.batch_size = 256
HEAD = 2048
N = 327_684
B, K = cfg.batch_size, 16
N_STORE = 512

groups = synthetic_groups(n_voxels=N, n_groups=360, seed=0)
layout = GroupLayout(groups, n_voxels=N)
model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
              embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
              vocab_size=cfg.vocab_size, max_length=cfg.max_length,
              head_dim=HEAD, pregathered=True)

rng = np.random.default_rng(0)
store = jax.jit(lambda: jax.random.normal(
    jax.random.PRNGKey(0), (N_STORE, N), jnp.float32))()
flat_idx = jnp.asarray(layout.flat_indices())


@jax.jit
def _prep(rows):
    # bench.py's on-device pregather+pack (permute into the encoder's
    # grouped layout, then the ops/gather.py packed (N, S, 128) shape) —
    # the host-side equivalent is layout.permute_rows + pack_rows
    from masters_thesis_tpu.ops.gather import LANES
    padded = jnp.concatenate(
        [rows, jnp.zeros((rows.shape[0], 1), rows.dtype)], axis=1)
    perm = jnp.take(padded, flat_idx, axis=1)
    w = perm.shape[1]
    wp = -(-w // LANES) * LANES
    perm = jnp.pad(perm, ((0, 0), (0, wp - w)))
    return perm.reshape(rows.shape[0], wp // LANES, LANES)


packed = _prep(store)
tokens = jnp.asarray(
    rng.integers(1, cfg.vocab_size, (B, cfg.max_length)), jnp.int32)
target = jnp.concatenate(
    [tokens[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
idx = jnp.asarray(rng.integers(0, N_STORE, (K, B)), jnp.int32)
betas0 = gather_rows(packed, idx[0])
params, bstats, prng = init_model(model, cfg, betas0, tokens)
a0 = jnp.zeros((B, cfg.units), jnp.float32)

results = {}

def _consume(g):
    # reduce over EVERY gradient leaf: consuming a single element lets XLA
    # dead-code-eliminate the other weight-grad matmuls and the embedding
    # scatter, silently understating fwd+bwd cost (measured: 32 ms with one
    # leaf vs ~60 ms honest)
    return sum(jnp.sum(jnp.square(l)) for l in jax.tree_util.tree_leaves(g))




def timed(name, fn, *args):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ms = (time.perf_counter() - t0) / (reps * K) * 1e3
    results[name] = round(ms, 3)
    print(f"{name:36s}: {ms:7.3f} ms/step", flush=True)


@jax.jit
def gather_scan(store, idx):
    def body(c, i):
        return c + gather_rows(store, i).sum(), None
    return jax.lax.scan(body, 0.0, idx)[0]


timed("pallas gather store->batch", gather_scan, packed, idx)


@jax.jit
def enc_scan(params, store, idx):
    def loss(p, b):
        feats = model.apply({"params": p, "batch_stats": bstats}, b,
                            method=model.encode)
        return jnp.sum(feats ** 2) * 1e-6
    def body(c, i):
        b = gather_rows(store, i)
        g = jax.grad(loss)(params, b)
        return c + _consume(g), None
    return jax.lax.scan(body, 0.0, idx)[0]


timed("encoder fwd+bwd (+gather)", enc_scan, params, packed, idx)


def _dec_loss(mod, feats, tokens):
    # decoder only (eval-mode: no dropout): attention + cell + head over
    # precomputed features, the same structure as __call__'s scan body
    emb = mod.embed(tokens)
    def step(carry, et):
        h, c = carry
        context, _ = mod.attention(h, feats, training=False)
        x = jnp.concatenate([context, et], axis=-1)
        (h, c), out = mod.cell((h, c), x)
        return (h, c), out
    _, hs = jax.lax.scan(step, (a0, a0), jnp.moveaxis(emb, 1, 0))
    logits = mod.head(jnp.moveaxis(hs, 0, 1), training=False)
    oh = jax.nn.one_hot(tokens, cfg.vocab_size)
    return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(logits), -1))


@jax.jit
def dec_scan(params, feats0, idx, tokens):
    # feats0 arrives as an ARGUMENT: a closed-over betas0 would serialize
    # as a 336 MB constant into the remote-compile request (HTTP 413)
    def loss(p, feats):
        return model.apply({"params": p, "batch_stats": bstats}, feats,
                           tokens, method=_dec_loss)
    def body(c, i):
        # input varies with the loop index: LICM must not hoist the grad
        g = jax.grad(loss)(params, feats0 * (1.0 + 1e-6 * i[0]))
        return c + _consume(g), None
    return jax.lax.scan(body, 0.0, idx)[0]


feats0 = jax.jit(
    lambda p, b: model.apply({"params": p, "batch_stats": bstats}, b,
                             method=model.encode))(params, betas0)
timed("decoder-only fwd+bwd", dec_scan, params, feats0, idx, tokens)


@jax.jit
def full_scan(params, store, idx, tokens):
    def loss(p, b):
        logits, _ = model.apply({"params": p, "batch_stats": bstats}, b,
                                tokens, a0, a0)
        oh = jax.nn.one_hot(tokens, cfg.vocab_size)
        return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(logits), -1))
    def body(c, i):
        b = gather_rows(store, i)
        g = jax.grad(loss)(params, b)
        return c + _consume(g), None
    return jax.lax.scan(body, 0.0, idx)[0]


timed("full model fwd+bwd (+gather)", full_scan, params, packed, idx, tokens)

# isolation rows for the production-vs-handbuilt gap: (a) the production
# loss (training=True: BN stats, dropout rngs, metrics) WITHOUT the
# optimizer; (b) the bare hand-built loss WITH the Adam update
from masters_thesis_tpu.train.steps import _forward_loss  # noqa: E402

_rules = lc_nic_l2_rules(cfg)


@jax.jit
def prodloss_scan(params, bstats_, rng_, store, idx, toks, tgts):
    def body(c, batch):
        i, tok_, tgt_ = batch
        b = gather_rows(store, i)
        r = jax.random.fold_in(rng_, c.astype(jnp.int32))
        (total, (m, ns)), g = jax.value_and_grad(
            lambda p: _forward_loss(model, cfg, _rules, p, bstats_, r,
                                    b, tok_, tgt_, None),
            has_aux=True)(params)
        return c + _consume(g), None
    return jax.lax.scan(
        body, jnp.float32(0),
        (idx, jnp.broadcast_to(tokens, (K, B, cfg.max_length)),
         jnp.broadcast_to(target, (K, B, cfg.max_length))))[0]


timed("production loss grad, no optimizer", prodloss_scan, params, bstats,
      prng, packed, idx, tokens, target)


def _my_loss(p, b, tokens):
    logits, _ = model.apply({"params": p, "batch_stats": bstats}, b,
                            tokens, a0, a0)
    oh = jax.nn.one_hot(tokens, cfg.vocab_size)
    return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(logits), -1))


tx_plain = make_optimizer(cfg)
state_plain = TrainState.create(
    params=jax.tree_util.tree_map(jnp.copy, params),
    batch_stats=jax.tree_util.tree_map(jnp.copy, bstats),
    tx=tx_plain, rng=jnp.copy(prng))


@jax.jit
def myloss_adam_scan(state, store, idx, tokens):
    def body(st, i):
        b = gather_rows(store, i)
        g = jax.grad(_my_loss)(st.params, b, tokens)
        return st.apply_gradients(g), None
    st, _ = jax.lax.scan(body, state, idx)
    return st.params["embedding"].ravel()[0]


timed("hand-built loss + Adam update", myloss_adam_scan, state_plain,
      packed, idx, tokens)

# production scanned step (dropout + clipnorm + L2 + Adam) plus knock-out
# variants that isolate where the gap beyond bare fwd+bwd goes
toks = jnp.broadcast_to(tokens, (K, B, cfg.max_length))
tgts = jnp.broadcast_to(target, (K, B, cfg.max_length))
VARIANTS = [
    ("float32", {}),
    ("bfloat16", {"compute_dtype": "bfloat16"}),
    ("fp32 no-dropout", {"dropout": 0.0}),
    ("fp32 no-drop/clip/L2", {"dropout": 0.0, "clipnorm": 0.0, "l2": 0.0}),
]
for label, mods in VARIANTS:
    c2 = dataclasses.replace(cfg)
    if "dropout" in mods:
        for f in ("dropout_input", "dropout_features", "dropout_text",
                  "dropout_lstm", "dropout_attn", "dropout_out"):
            setattr(c2, f, 0.0)
    if "clipnorm" in mods:
        c2.clipnorm = 0.0
    if "l2" in mods:
        for f in ("input_reg", "attn_reg", "lstm_reg", "output_reg"):
            setattr(c2, f, 0.0)
    c2.tpu = dataclasses.replace(
        cfg.tpu, compute_dtype=mods.get("compute_dtype", "float32"))
    tx = make_optimizer(c2)
    rules = lc_nic_l2_rules(c2)
    sstep = make_scanned_train_steps(model, c2, rules, store_width=None)
    state = TrainState.create(
        params=jax.tree_util.tree_map(jnp.copy, params),
        batch_stats=jax.tree_util.tree_map(jnp.copy, bstats),
        tx=tx, rng=jnp.copy(prng))

    holder = {"state": state}

    def prod(packed, idx, toks, tgts, sstep=sstep, holder=holder):
        # re-thread the state like the real trainer: the scanned step
        # donates its state buffers, so reusing the original crashes
        st, m = sstep(holder["state"], packed, idx, toks, tgts)
        holder["state"] = st
        return m["loss"]

    timed(f"production step ({label})", prod, packed, idx, toks, tgts)

art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "mfu_scaled_decomp.json")
with open(art, "w") as f:
    json.dump({"device": str(jax.devices()[0]),
               "config": {"units": cfg.units, "group_size": cfg.group_size,
                          "attn_units": cfg.attn_units, "head_dim": HEAD,
                          "vocab": cfg.vocab_size, "batch": B, "K": K},
               "ms_per_step": results}, f, indent=1)
print(json.dumps({"written": art}), flush=True)
