"""Isolate the betas row-gather: XLA take vs Pallas scalar-prefetch gather.

Measured: XLA take(axis=0) moves 64 random 1.3 MB rows at ~16 GB/s — 40-50x
under HBM bandwidth; it dominates the scanned train step (4.6 of 7.2 ms).
The Pallas gather drives one DMA per (row, chunk) grid cell with the row id
scalar-prefetched into the BlockSpec index_map, so the copies pipeline."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N, V, B, K = 1024, 327_684, 64, 32
VPAD = -(-V // 1024) * 1024          # 328704 = 128 * 2568, 2568 = 8*321
S = VPAD // 128                      # sublane-chunk count
rng = np.random.default_rng(0)
store = jnp.asarray(rng.standard_normal((N, V)), jnp.float32)
store3 = jnp.pad(store, ((0, 0), (0, VPAD - V))).reshape(N, S, 128)
idx = jnp.asarray(rng.integers(0, N, (K, B)), jnp.int32)

def bench(tag, fn, st):
    out = fn(st, idx); float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter(); reps = 3
    for _ in range(reps):
        out = fn(st, idx)
        float(np.asarray(out).ravel()[0])
    dt = time.perf_counter() - t0
    gb = reps * K * B * V * 4 / 1e9
    print(f"{tag:26s}: {gb/dt:7.1f} GB/s  ({dt/reps*1000:.1f} ms per {K}-step chunk)", flush=True)

@jax.jit
def xla_take(store, idx):
    def body(c, i):
        rows = jnp.take(store, i, axis=0)
        return c + rows.sum(), 0
    s, _ = jax.lax.scan(body, 0.0, idx)
    return s

def _gather_kernel(idx_ref, store_ref, out_ref):
    out_ref[:] = store_ref[:]

def make_pallas_take(s_block):
    def gather(store3, flat_idx):
        nrows = flat_idx.shape[0]
        grid = (nrows, S // s_block)
        return pl.pallas_call(
            _gather_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[pl.BlockSpec((1, s_block, 128),
                                       lambda i, j, idx_ref: (idx_ref[i], j, 0))],
                out_specs=pl.BlockSpec((1, s_block, 128),
                                       lambda i, j, idx_ref: (i, j, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((nrows, S, 128), jnp.float32),
        )(flat_idx, store3)

    @jax.jit
    def fn(store3, idx):
        def body(c, i):
            rows = gather(store3, i)
            return c + rows.sum(), 0
        s, _ = jax.lax.scan(body, 0.0, idx)
        return s
    return fn

bench("XLA take(axis=0)", xla_take, store)
for sb in (8, 24, 856, S):
    assert S % sb == 0
    try:
        bench(f"pallas gather s_block={sb}", make_pallas_take(sb), store3)
    except Exception as e:
        print(f"  s_block={sb} failed: {str(e)[:200]}", flush=True)
