"""Fused whole-decode kernel: batch-tile / feature-dtype sweep beyond the
shipped bt=64 fp32 default (VMEM is 128 MB; bigger tiles fill more MXU
rows)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_groups
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.fused_decode import make_whole_fused_greedy_decoder
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.train.state import init_model

cfg = Config()
N = 327_684
layout = GroupLayout(synthetic_groups(n_voxels=N, n_groups=360, seed=0),
                     n_voxels=N)
model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
              embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
              vocab_size=cfg.vocab_size, max_length=cfg.max_length)
rng = np.random.default_rng(0)
B, DEC_K = cfg.batch_size, 16
flat = jnp.asarray(rng.standard_normal((DEC_K * B, N)), jnp.float32)
tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, cfg.max_length)),
                     jnp.int32)
params, bstats, _ = init_model(model, cfg, np.asarray(flat[:B]), tokens)
variables = {"params": params, "batch_stats": bstats}

ref_words = None
for bt, bf16 in ((64, False), (128, False), (64, True), (128, True)
                 ):
    try:
        dec = make_whole_fused_greedy_decoder(
            model, cfg.units, cfg.max_length, batch_tile=bt, feat_bf16=bf16)
        t0 = time.perf_counter()
        words, _ = dec(variables, flat, 3)
        w = np.asarray(words)
        compile_s = time.perf_counter() - t0
        if ref_words is None:
            ref_words = w
        match = float((w == ref_words).mean())
        reps = 4
        t0 = time.perf_counter()
        for _ in range(reps):
            words, _ = dec(variables, flat, 3)
            np.asarray(words)
        cps = reps * DEC_K * B / (time.perf_counter() - t0)
        print(f"bt={bt:3d} bf16={int(bf16)}: {cps:8,.0f} captions/s "
              f"(compile {compile_s:5.1f}s, tokens match {match:.3f})",
              flush=True)
    except Exception as e:
        print(f"bt={bt:3d} bf16={int(bf16)}: FAILED {type(e).__name__}: "
              f"{str(e)[:150]}", flush=True)
