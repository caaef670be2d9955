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


# ---- variant 2: direct HBM->HBM row copies, NB outstanding DMAs ----------
# refs stay in ANY (HBM) memory space: no VMEM staging, no tiling
# constraints, so this works on the raw 2D (N, V) store directly.
def make_dma_take(nb, store_arr):
    def _kernel(idx_ref, store_ref, out_ref, sem):
        nrows = out_ref.shape[0]

        def dma(i):
            return pltpu.make_async_copy(
                store_ref.at[idx_ref[i]], out_ref.at[i], sem.at[i % nb])

        def body(i, _):
            @pl.when(i >= nb)
            def _():
                dma(i - nb).wait()
            dma(i).start()
            return 0

        jax.lax.fori_loop(0, nrows, body, 0)

        def drain(i, _):
            dma(i).wait()
            return 0

        jax.lax.fori_loop(jnp.maximum(0, nrows - nb), nrows, drain, 0)

    def gather(st, flat_idx):
        return pl.pallas_call(
            _kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                scratch_shapes=[pltpu.SemaphoreType.DMA((nb,))],
            ),
            out_shape=jax.ShapeDtypeStruct((flat_idx.shape[0],)
                                           + st.shape[1:], st.dtype),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(flat_idx, st)

    @jax.jit
    def fn(st, idx):
        def body(c, i):
            rows = gather(st, i)
            return c + rows.sum(), 0
        s, _ = jax.lax.scan(body, 0.0, idx)
        return s
    return fn


for nb in (2, 4, 8, 16):
    try:
        bench(f"dma hbm2hbm 2D nb={nb}", make_dma_take(nb, store), store)
    except Exception as e:
        print(f"  nb={nb} failed: {str(e)[:300]}", flush=True)

# correctness: dma gather == take
@jax.jit
def take_once(st, i):
    return jnp.take(st, i, axis=0)
one_idx = idx[0]
got = None
try:
    # standalone copy of make_dma_take's nb=4 kernel body returning the raw
    # rows (the benched fn reduces them to a scalar, so it can't be reused
    # for a value check directly) — keep in sync if the DMA logic changes
    def _check():
        def _kernel(idx_ref, store_ref, out_ref, sem):
            nrows = out_ref.shape[0]
            def dma(i):
                return pltpu.make_async_copy(
                    store_ref.at[idx_ref[i]], out_ref.at[i], sem.at[i % 4])
            def body(i, _):
                @pl.when(i >= 4)
                def _():
                    dma(i - 4).wait()
                dma(i).start()
                return 0
            jax.lax.fori_loop(0, nrows, body, 0)
            def drain(i, _):
                dma(i).wait()
                return 0
            jax.lax.fori_loop(jnp.maximum(0, nrows - 4), nrows, drain, 0)
        return pl.pallas_call(
            _kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                scratch_shapes=[pltpu.SemaphoreType.DMA((4,))],
            ),
            out_shape=jax.ShapeDtypeStruct((one_idx.shape[0], V), store.dtype),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(one_idx, store)
    rows = _check()
    ref = take_once(store, one_idx)
    print("dma gather exact:", bool((np.asarray(rows) == np.asarray(ref)).all()),
          flush=True)
except Exception as e:
    print("check failed:", str(e)[:300], flush=True)
