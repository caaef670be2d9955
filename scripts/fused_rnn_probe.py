"""Fused recurrent fwd+bwd kernel in the full train step vs the XLA scan,
flagship shapes, dropout off (kernel has no dropout path yet); K=128
scanned steps, pregathered store + Pallas gather in both."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from functools import partial
from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_groups
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.ops.gather import gather_rows, pack_rows
from masters_thesis_tpu.ops.fused_decode import pad_regions
from masters_thesis_tpu.ops.fused_rnn import fused_rnn
from masters_thesis_tpu.train.losses import (
    accuracy, attention_loss, caption_loss, l2_loss, lc_nic_l2_rules)
from masters_thesis_tpu.train.optim import make_optimizer
from masters_thesis_tpu.train.state import TrainState, init_model

cfg = Config(dropout_features=0.0, dropout_text=0.0, dropout_attn=0.0,
             dropout_lstm=0.0, dropout_out=0.0, dropout_input=0.0)
N, B, K = 327_684, cfg.batch_size, 128
groups = synthetic_groups(n_voxels=N, n_groups=360, seed=0)
layout = GroupLayout(groups, n_voxels=N)
model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
              embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
              vocab_size=cfg.vocab_size, max_length=cfg.max_length,
              pregathered=True,
              dropout_features=0.0, dropout_text=0.0, dropout_attn=0.0,
              dropout_lstm=0.0, dropout_out=0.0)
rng = np.random.default_rng(0)
packed = pack_rows(layout.permute_rows(rng.standard_normal((1024, N)).astype(np.float32)))
tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, cfg.max_length)), jnp.int32)
target = jnp.concatenate([tokens[:, 1:], jnp.zeros((B, 1), jnp.int32)], 1)
idx = jnp.asarray(rng.integers(0, 1024, (K, B)), jnp.int32)
toks = jnp.broadcast_to(tokens, (K, B, cfg.max_length))
tgts = jnp.broadcast_to(target, (K, B, cfg.max_length))
betas0 = gather_rows(packed, idx[0])
params, bstats, prng = init_model(model, cfg, betas0, toks[0])
tx = make_optimizer(cfg)
rules = lc_nic_l2_rules(cfg)

def fresh():
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    return TrainState.create(params=copy(params), batch_stats=copy(bstats),
                             tx=tx, rng=jnp.copy(prng))

def bench(tag, step):
    st = fresh()
    st, m = step(st, packed, idx, toks, tgts)
    loss0 = float(np.asarray(m["loss"])[-1])
    t0 = time.perf_counter(); reps = 2
    for _ in range(reps):
        st, m = step(st, packed, idx, toks, tgts)
        loss = float(np.asarray(m["loss"])[-1])
    sps = K * reps / (time.perf_counter() - t0)
    print(f"{tag:24s}: {sps:7.1f} steps/s (loss {loss0:.4f} -> {loss:.4f})",
          flush=True)

# ---- baseline: current XLA scanned path ----
from masters_thesis_tpu.train.steps import make_scanned_train_steps
bench("XLA nn.scan fwd+bwd", make_scanned_train_steps(model, cfg, rules))

# ---- fused-RNN step ----
R = 360
BT = int(os.environ.get("FUSED_BT", "8"))

def fused_forward_loss(p, bstats_, betas, tok_, tgt_):
    feats, mut = model.apply({"params": p, "batch_stats": bstats_}, betas,
                             True, method=model.encode,
                             mutable=["batch_stats"])
    attn = p["attention"]
    pre = feats @ attn["W1"]["kernel"] + attn["W1"]["bias"]
    pre_p, _ = pad_regions(pre)
    feat_p, _ = pad_regions(feats)
    emb = jnp.take(p["embedding"], tok_, axis=0)
    hseq, alphas = fused_rnn(
        pre_p, feat_p, emb,
        attn["W2"]["kernel"], attn["W2"]["bias"],
        attn["V"]["kernel"][:, 0], attn["V"]["bias"][0],
        p["lstm"]["kernel"], p["lstm"]["recurrent_kernel"], p["lstm"]["bias"],
        R, cfg.units, cfg.max_length, BT)
    logits = model.apply({"params": p, "batch_stats": bstats_}, hseq, True,
                         method=model.head)
    alphas = alphas[:, :, :R]
    cce = caption_loss(logits, tgt_, None)
    l2 = l2_loss(p, rules)
    at = attention_loss(alphas)
    total = cce + l2 + (at if cfg.attn_loss else 0.0)
    metrics = {"loss": cce, "L2": l2, "attention": at,
               "accuracy": accuracy(logits, tgt_, None)}
    return total, (metrics, mut.get("batch_stats", bstats_))

@partial(jax.jit, donate_argnums=(0,))
def fused_steps(state, store, idx, tokens, target):
    def body(state, batch):
        i_, tok_, tgt_ = batch
        betas = gather_rows(store, i_)
        (total, (metrics, new_stats)), grads = jax.value_and_grad(
            fused_forward_loss, has_aux=True)(
                state.params, state.batch_stats, betas, tok_, tgt_)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        metrics["total"] = total
        return new_state, metrics
    return jax.lax.scan(body, state, (idx, tokens, target))

bench(f"fused-RNN kernel bt={BT}", fused_steps)
