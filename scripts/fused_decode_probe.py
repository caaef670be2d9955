"""Whole-decode Pallas kernel vs plain XLA scanned greedy, flagship shapes.

Sweeps batch_tile; reports captions/s and token agreement (bf16 weights in
the kernel vs XLA DEFAULT precision can diverge on argmax ties)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_groups
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.ops.fused_decode import make_whole_fused_greedy_decoder
from masters_thesis_tpu.decode.greedy import make_greedy_decoder
from masters_thesis_tpu.train.state import init_model

cfg = Config()
N, B, K = 327_684, cfg.batch_size, 16
groups = synthetic_groups(n_voxels=N, n_groups=360, seed=0)
layout = GroupLayout(groups, n_voxels=N)
model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
              embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
              vocab_size=cfg.vocab_size, max_length=cfg.max_length)
rng = np.random.default_rng(0)
store = jnp.asarray(rng.standard_normal((K * B, N)), jnp.float32)
tokens = jnp.zeros((B, cfg.max_length), jnp.int32)
params, bstats, _ = init_model(model, cfg, store[:B], tokens)
variables = {"params": params, "batch_stats": bstats}
stacked = store.reshape(K, B, N)

def bench(tag, dec):
    @jax.jit
    def scanned(variables, betas):
        def body(_, b):
            out = dec(variables, b, 3)
            return 0, out[0]
        _, w = jax.lax.scan(body, 0, betas)
        return w
    w = scanned(variables, stacked); np.asarray(w)
    t0 = time.perf_counter(); reps = 4
    for _ in range(reps):
        w = scanned(variables, stacked); np.asarray(w)
    dt = time.perf_counter() - t0
    print(f"{tag:28s}: {reps*K*B/dt:9.1f} captions/s", flush=True)
    return np.asarray(w)

w_plain = bench("plain XLA", make_greedy_decoder(model, cfg.units, cfg.max_length))
for bt, fb in ((16, False), (32, False), (64, True), (64, False)):
    try:
        w_fused = bench(f"fused whole-decode bt={bt} fb16={fb}",
                        make_whole_fused_greedy_decoder(
                            model, cfg.units, cfg.max_length, batch_tile=bt,
                            feat_bf16=fb))
        agree = float((w_plain == w_fused).mean())
        print(f"  token agreement vs XLA: {agree:.4f}", flush=True)
    except Exception as e:
        print(f"  bt={bt} failed:", str(e)[:300], flush=True)
