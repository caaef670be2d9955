"""Beam-search serving throughput at flagship scale (width 5, alpha 0.7):
the soloist evaluate.py path batched K batches per device call."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_groups
from masters_thesis_tpu.decode.beam import make_scanned_beam_decoder
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.train.state import init_model

cfg = Config()
N = 327_684
layout = GroupLayout(synthetic_groups(n_voxels=N, n_groups=360, seed=0), n_voxels=N)
model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
              embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
              vocab_size=cfg.vocab_size, max_length=cfg.max_length)
rng = np.random.default_rng(0)
B, K = cfg.batch_size, int(os.environ.get("MTT_BEAM_K", "8"))
# betas generated ON DEVICE: a (K, B, 327684) host upload rides the
# ~16 MB/s tunnel (670 MB at K=8) and dominates cold-start wall time
betas = jax.jit(lambda: jax.random.normal(
    jax.random.PRNGKey(0), (K, B, N), jnp.float32))()
tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, cfg.max_length)), jnp.int32)
params, bstats, _ = init_model(model, cfg, np.asarray(betas[0]), tokens)
variables = {"params": params, "batch_stats": bstats}

dec = make_scanned_beam_decoder(model, cfg.units, cfg.max_length, beam_width=5)
t0 = time.perf_counter()
words = dec(variables, betas, 3, 4)
np.asarray(words)
print(f"compile+warm {time.perf_counter()-t0:.1f}s, out {words.shape}", flush=True)
reps = 3
t0 = time.perf_counter()
for _ in range(reps):
    words = dec(variables, betas, 3, 4)
    np.asarray(words)
dt = time.perf_counter() - t0
print(f"beam w=5: {reps*K*B/dt:,.0f} captions/s ({dt/reps/K*1e3:.2f} ms/batch)",
      flush=True)

# ---- lattice-width sweep (round 5): the K-batch scan runs the lattice at
# B=64 -> 320 beam-rows per step matmul, ~1/4 of an MXU tile. Folding scan
# batches INTO the lattice batch (fewer scan iterations x wider matmuls)
# trades scan length for MXU fill; sweep via MTT_BEAM_LAT="128,256".
for lat in [int(x) for x in os.environ.get("MTT_BEAM_LAT", "").split(",")
            if x.strip()]:
    assert (K * B) % lat == 0, (K, B, lat)
    k2 = K * B // lat
    betas_l = betas.reshape(k2, lat, N)
    t0 = time.perf_counter()
    words = dec(variables, betas_l, 3, 4)
    np.asarray(words)
    print(f"  lat={lat}: compile+warm {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        words = dec(variables, betas_l, 3, 4)
        np.asarray(words)
    dt = time.perf_counter() - t0
    print(f"beam w=5 lattice={lat}: {reps*K*B/dt:,.0f} captions/s",
          flush=True)
