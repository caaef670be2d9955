"""Isolate the betas row-gather: XLA take vs Pallas scalar-prefetch gather.

The scanned train step's on-chip decomposition (PERF.md) attributes ~4.6 of
7.2 ms/step to gathering 64 random rows (84 MB) from the HBM-resident store —
~18 GB/s effective, 40x off HBM bandwidth. This probes the gather alone."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N, V, B, K = 1024, 327_684, 64, 32
rng = np.random.default_rng(0)
store = jnp.asarray(rng.standard_normal((N, V)), jnp.float32)
idx = jnp.asarray(rng.integers(0, N, (K, B)), jnp.int32)

def bench(tag, fn):
    out = fn(store, idx); jax.block_until_ready(out); float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter(); reps = 3
    for _ in range(reps):
        out = fn(store, idx)
        s = float(np.asarray(out).ravel()[0])
    dt = time.perf_counter() - t0
    gb = reps * K * B * V * 4 / 1e9
    print(f"{tag:26s}: {gb/dt:7.1f} GB/s  ({dt/reps*1000:.1f} ms per {K}-step chunk)", flush=True)

@jax.jit
def xla_take(store, idx):
    def body(c, i):
        rows = jnp.take(store, i, axis=0)        # (B, V)
        return c + rows.sum(), 0
    s, _ = jax.lax.scan(body, 0.0, idx)
    return s

# Pallas gather: grid over (step, row); scalar-prefetched indices drive the
# input block index_map, so each grid cell DMAs exactly one store row.
def _gather_kernel(idx_ref, store_ref, out_ref):
    out_ref[:] = store_ref[:]

def pallas_gather_rows(store, flat_idx, width_block):
    nrows = flat_idx.shape[0]
    grid = (nrows, V // width_block)
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec((1, width_block),
                                   lambda i, j, idx_ref: (idx_ref[i], j))],
            out_specs=pl.BlockSpec((1, width_block), lambda i, j, idx_ref: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((nrows, V), jnp.float32),
    )(flat_idx, store)

def make_pallas_take(width_block):
    @jax.jit
    def fn(store, idx):
        def body(c, i):
            rows = pallas_gather_rows(store, i, width_block)
            return c + rows.sum(), 0
        s, _ = jax.lax.scan(body, 0.0, idx)
        return s
    return fn

bench("XLA take(axis=0)", xla_take)
VP = 327_684
for wb in (27307 * 4, ):  # V = 327684 = 4*81921 = ... need divisor of V
    pass
# V = 327684 = 2^2 * 3 * 27307^1? factor: 327684 / 4 = 81921 = 3 * 27307. 27307 prime?
# use a padded store width for clean tiling instead
VPAD = 328_064  # next multiple of 1024 lanes... 327684 -> round up to 512: 327_680+512=328_192? compute in-code
VPAD = -(-V // 512) * 512
store_p = jnp.pad(store, ((0, 0), (0, VPAD - V)))

def make_pallas_take_padded(width_block):
    @jax.jit
    def fn(store_p, idx):
        def body(c, i):
            nrows = i.shape[0]
            grid = (nrows, VPAD // width_block)
            rows = pl.pallas_call(
                _gather_kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=grid,
                    in_specs=[pl.BlockSpec((1, width_block),
                                           lambda i, j, idx_ref: (idx_ref[i], j))],
                    out_specs=pl.BlockSpec((1, width_block),
                                           lambda i, j, idx_ref: (i, j)),
                ),
                out_shape=jax.ShapeDtypeStruct((nrows, VPAD), jnp.float32),
            )(i, store_p)
            return c + rows.sum(), 0
        s, _ = jax.lax.scan(body, 0.0, idx)
        return s
    return fn

for wb in (512, 4096, 8192, VPAD // 8, VPAD):
    if VPAD % wb == 0:
        try:
            bench(f"pallas gather wb={wb}", make_pallas_take_padded(wb))
        except Exception as e:
            print(f"  wb={wb} failed: {str(e)[:200]}", flush=True)
