import numpy as np, jax, jax.numpy as jnp, time, os
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from masters_thesis_tpu.ops.block_dense import block_dense_leaky
rng = np.random.default_rng(0)
B,G,P,D = 64, 106, 1024, 32
xg = jnp.asarray(rng.standard_normal((B,G,P)), jnp.float32)
w = jnp.asarray(rng.standard_normal((G,P,D)), jnp.float32)
b = jnp.asarray(rng.standard_normal((G,D)), jnp.float32)
f = jax.jit(block_dense_leaky)
t0=time.time(); out = f(xg,w,b); out.block_until_ready()
print("block_dense pallas compile+run:", round(time.time()-t0,1), flush=True)
def xla(x,w,b):
    y = jnp.einsum("bgp,gpd->bgd",x,w)+b
    return jnp.where(y>=0,y,0.2*y)
ref = xla(xg,w,b)
print("maxdiff:", float(jnp.abs(out-ref).max()), flush=True)
g = jax.jit(xla); _ = g(xg,w,b).block_until_ready()
t0=time.time()
for _ in range(100): out = f(xg,w,b)
out.block_until_ready(); tp = time.time()-t0
t0=time.time()
for _ in range(100): out2 = g(xg,w,b)
out2.block_until_ready(); tx = time.time()-t0
print(f"block_dense: pallas {tp*10:.3f}ms/it  xla {tx*10:.3f}ms/it", flush=True)

# fused decode step on TPU
from masters_thesis_tpu.ops.fused_step import fused_decode_step, pad_regions
U,R,A,D2,E = 512, 345, 32, 32, 512
h = jnp.zeros((B,U)); c = jnp.zeros((B,U))
feat = jnp.asarray(rng.standard_normal((B,R,D2)), jnp.float32)
w1 = jnp.asarray(rng.standard_normal((D2,A)), jnp.float32)*0.1
pre = feat @ w1
pre_p,_ = pad_regions(pre); feat_p,_ = pad_regions(feat)
w2 = jnp.asarray(rng.standard_normal((U,A)), jnp.float32)*0.05
b2 = jnp.zeros((A,)); v = jnp.asarray(rng.standard_normal((A,)), jnp.float32); bv = 0.0
emb = jnp.asarray(rng.standard_normal((B,E)), jnp.float32)
wx = jnp.asarray(rng.standard_normal((D2+E,4*U)), jnp.float32)*0.02
wh = jnp.asarray(rng.standard_normal((U,4*U)), jnp.float32)*0.02
bb = jnp.zeros((4*U,))
fs = jax.jit(lambda h,c,emb: fused_decode_step(h,c,pre_p,feat_p,w2,b2,v,bv,emb,wx,wh,bb,n_regions=R))
t0=time.time(); h2,c2,al = fs(h,c,emb); h2.block_until_ready()
print("fused_step compile+run:", round(time.time()-t0,1), flush=True)
t0=time.time()
for _ in range(200): h2,c2,al = fs(h2,c2,emb)
h2.block_until_ready(); print(f"fused_step: {(time.time()-t0)*5:.3f}ms/it", flush=True)
print("alpha sum:", float(al.sum(-1)[0]))
