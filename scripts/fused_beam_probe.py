"""Fused whole-beam kernel vs the XLA scanned beam at flagship scale
(width 5, alpha 0.7): token parity + captions/s across batch tiles."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_groups
from masters_thesis_tpu.decode.beam import make_beam_decoder
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.fused_beam import make_whole_fused_beam_decoder
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.train.state import init_model

cfg = Config()
N = 327_684
W = 5
layout = GroupLayout(synthetic_groups(n_voxels=N, n_groups=360, seed=0), n_voxels=N)
model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
              embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
              vocab_size=cfg.vocab_size, max_length=cfg.max_length)
rng = np.random.default_rng(0)
B, DEC_K = cfg.batch_size, 8
flat = jnp.asarray(rng.standard_normal((DEC_K * B, N)), jnp.float32)
tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, cfg.max_length)), jnp.int32)
params, bstats, _ = init_model(model, cfg, np.asarray(flat[:B]), tokens)
variables = {"params": params, "batch_stats": bstats}

# XLA reference (per-batch; the scanned variant measured the same per-caption)
ref = make_beam_decoder(model, cfg.units, cfg.max_length, beam_width=W)
t0 = time.perf_counter()
wr, _, ar, _, _ = ref(variables, flat[:B], 3, 4)
wr = np.asarray(wr); ar = np.asarray(ar)
print(f"xla beam compile {time.perf_counter()-t0:.1f}s", flush=True)
reps = 4
t0 = time.perf_counter()
for _ in range(reps):
    for k in range(DEC_K):
        w, _, _, _, _ = ref(variables, flat[k*B:(k+1)*B], 3, 4)
        np.asarray(w)
dt = time.perf_counter() - t0
print(f"xla  beam w={W}: {reps*DEC_K*B/dt:8,.0f} captions/s", flush=True)

for bt in (16, 32, 64):
    try:
        dec = make_whole_fused_beam_decoder(
            model, cfg.units, cfg.max_length, beam_width=W, batch_tile=bt)
        t0 = time.perf_counter()
        wf, _, af, _, _ = dec(variables, flat[:B], 3, 4)
        wf = np.asarray(wf); af = np.asarray(af)
        compile_s = time.perf_counter() - t0
        match = float((wf == wr).mean())
        adiff = float(np.abs(af - ar).max())
        t0 = time.perf_counter()
        for _ in range(reps):
            for k in range(DEC_K):
                w, _, _, _, _ = dec(variables, flat[k*B:(k+1)*B], 3, 4)
                np.asarray(w)
        dt = time.perf_counter() - t0
        print(f"fused bt={bt:3d}: {reps*DEC_K*B/dt:8,.0f} captions/s "
              f"(compile {compile_s:5.1f}s, tokens match {match:.4f}, "
              f"alpha diff {adiff:.2e})", flush=True)
    except Exception as e:
        print(f"fused bt={bt:3d}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
