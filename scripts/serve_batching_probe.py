"""Captioner serving-throughput probe at flagship scale (greedy, N=512):
(a) shipped per-batch loop (forces each batch), (b) deferred-force loop
(device calls pipeline; one host sync at the end), (c) one whole-request
dispatch (the fused kernel grid-tiles any B). Host-resident inputs — this
measures what a real caller sees, transfers included."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_groups
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.train.state import init_model
from masters_thesis_tpu.data.tokenizer import Tokenizer

cfg = Config()
N_VOX = 327_684
layout = GroupLayout(synthetic_groups(n_voxels=N_VOX, n_groups=360, seed=0),
                     n_voxels=N_VOX)
model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
              embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
              vocab_size=cfg.vocab_size, max_length=cfg.max_length)
rng = np.random.default_rng(0)
N, B = 512, cfg.batch_size
inputs = rng.standard_normal((N, N_VOX)).astype(np.float32)
tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, cfg.max_length)), jnp.int32)
params, bstats, _ = init_model(model, cfg, inputs[:B], tokens)

tok = Tokenizer(num_words=cfg.vocab_size - 1)
tok.fit_on_texts(["<start> a b c d e <end>"] * 4)
tok.install_pad()
from masters_thesis_tpu.serve import Captioner
cap = Captioner.from_components(model, params, bstats, tok, cfg.units,
                                cfg.max_length, batch_size=B,
                                input_width=N_VOX)

def timed(fn, label, reps=3):
    fn()  # warm compiles
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
        np.asarray(out)
    dt = time.perf_counter() - t0
    print(f"{label:32s} {reps * N / dt:8,.0f} captions/s", flush=True)
    return out

# (a) shipped loop
w_a = timed(lambda: cap.caption_ids(inputs), "per-batch loop (shipped)")

# (b) deferred-force loop: dispatch all batches, force once
dec = cap._decoder("greedy")
def deferred():
    outs = []
    for i in range(0, N, B):
        words, _, _ = dec(cap.variables, jnp.asarray(inputs[i:i + B]),
                          tok.start_id)
        outs.append(words)
    return np.concatenate([np.asarray(w) for w in outs])
w_b = timed(deferred, "deferred-force loop")

# (c) one whole-request dispatch (kernel grid-tiles B=512)
from masters_thesis_tpu.ops.fused_decode import make_whole_fused_greedy_decoder
big = make_whole_fused_greedy_decoder(model, cfg.units, cfg.max_length,
                                      batch_tile=64)
def whole():
    words, _ = big(cap.variables, jnp.asarray(inputs), tok.start_id)
    return np.asarray(words)
w_c = timed(whole, "whole-request dispatch")

print("tokens equal a==b:", bool((w_a == w_b).all()),
      "a==c:", bool((w_a == w_c).all()), flush=True)
