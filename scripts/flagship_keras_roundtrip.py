"""Flagship-scale reference-checkpoint round trip (round 5, VERDICT r4
item 6).

keras_import is parity-tested at small dims, including against a real
tf_keras h5 (tests/test_keras_import.py); this script runs the import ONCE
at the dims the thesis actually shipped — 327,684 voxels / 360 Glasser
groups / vocab 5001 / units 512 (AttemptFour config.yaml) — end to end:

  1. synthesize a reference-shaped ``model-ep164.h5`` (the reference's
     save_weights layout for lc_NIC, same dataset names the tf_keras
     parity test verified, with every shape taken from the real flagship
     model/layout);
  2. ``import_lc_nic_h5`` + ``import_bn_stats_h5`` into flagship params;
  3. verify the mapping (every imported tensor equals its h5 source; the
     345 per-group kernels land in the right bucket rows);
  4. greedy-decode a batch ON THE CHIP through the imported weights (the
     eval.py:116-141 path) and write the reference's eval artifact set
     (output_captions_{e}.npy, attention_scores_{e}.npy, captions_{e}.txt).

Writes artifacts/flagship_keras_roundtrip.json.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E402,E702
import json
import tempfile
import time

import h5py
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_groups
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.train.state import init_model
from masters_thesis_tpu.utils.keras_import import (
    import_bn_stats_h5,
    import_lc_nic_h5,
)

t_start = time.perf_counter()
cfg = Config()  # reference flagship: units 512, vocab 5001, max_len 15
N, G = 327_684, 360
groups = synthetic_groups(n_voxels=N, n_groups=G, seed=0)
layout = GroupLayout(groups, n_voxels=N)
model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
              embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
              vocab_size=cfg.vocab_size, max_length=cfg.max_length)

rng = np.random.default_rng(0)
B = 64
betas = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
tokens = jnp.zeros((B, cfg.max_length), jnp.int32)
print("initializing flagship params...", flush=True)
params, bstats, _ = init_model(model, cfg, betas, tokens)

# ---- 1. reference-shaped h5 at full dims -------------------------------
g = cfg.group_size
h5dir = tempfile.mkdtemp(prefix="mtt_flagship_h5_")
h5path = os.path.join(h5dir, "model-ep164.h5")
arrs = {}
print("writing reference-shaped h5 (flagship shapes)...", flush=True)
with h5py.File(h5path, "w") as f:
    def ds(name, shape, positive=False):
        a = rng.standard_normal(shape).astype(np.float32) * 0.05
        if positive:
            a = np.abs(a) + 0.1
        f.create_dataset(name, data=a)
        return a

    arrs["emb"] = ds("emb_text/embeddings:0",
                     (cfg.vocab_size, cfg.embedding_text))
    arrs["lk"] = ds("lstm/lstm_cell/kernel:0",
                    (g + cfg.embedding_text, 4 * cfg.units))
    arrs["lr"] = ds("lstm/lstm_cell/recurrent_kernel:0",
                    (cfg.units, 4 * cfg.units))
    arrs["lb"] = ds("lstm/lstm_cell/bias:0", (4 * cfg.units,))
    arrs["di_k"] = ds("time_distributed_nonlinear/dense/kernel:0",
                      (cfg.units, 256))
    arrs["di_b"] = ds("time_distributed_nonlinear/dense/bias:0", (256,))
    arrs["do_k"] = ds("time_distributed_softmax/dense_1/kernel:0",
                      (256, cfg.vocab_size))
    arrs["do_b"] = ds("time_distributed_softmax/dense_1/bias:0",
                      (cfg.vocab_size,))
    arrs["w1"] = ds("attention/dense_2/kernel:0", (g, cfg.attn_units))
    arrs["w1b"] = ds("attention/dense_2/bias:0", (cfg.attn_units,))
    arrs["w2"] = ds("attention/dense_3/kernel:0",
                    (cfg.units, cfg.attn_units))
    arrs["w2b"] = ds("attention/dense_3/bias:0", (cfg.attn_units,))
    arrs["v"] = ds("attention/dense_4/kernel:0", (cfg.attn_units, 1))
    arrs["vb"] = ds("attention/dense_4/bias:0", (1,))
    for i, grp in enumerate(groups):
        suffix = "" if i == 0 else f"_{i}"
        arrs[f"g{i}k"] = ds(f"locally_dense/dense{suffix}/kernel:0",
                            (len(grp), g))
        arrs[f"g{i}b"] = ds(f"locally_dense/dense{suffix}/bias:0", (g,))
    bn_shape = np.asarray(bstats["encoder"]["input_bn"]["mean"]).shape
    arrs["bn_g"] = ds("locally_dense/input_bn/gamma:0", bn_shape)
    arrs["bn_b"] = ds("locally_dense/input_bn/beta:0", bn_shape)
    arrs["bn_mm"] = ds("locally_dense/input_bn/moving_mean:0", bn_shape)
    arrs["bn_mv"] = ds("locally_dense/input_bn/moving_variance:0",
                       bn_shape, positive=True)
h5_mb = os.path.getsize(h5path) / 1e6

# ---- 2+3. import and verify the mapping --------------------------------
print(f"h5 written ({h5_mb:.0f} MB); importing...", flush=True)
new = import_lc_nic_h5(h5path, jax.device_get(params), layout)
stats = import_bn_stats_h5(h5path, jax.device_get(bstats))

checks = {}
np.testing.assert_array_equal(new["embedding"], arrs["emb"])
np.testing.assert_array_equal(new["lstm"]["kernel"], arrs["lk"])
np.testing.assert_array_equal(new["lstm"]["recurrent_kernel"], arrs["lr"])
np.testing.assert_array_equal(new["attention"]["W1"]["kernel"], arrs["w1"])
np.testing.assert_array_equal(new["attention"]["V"]["kernel"], arrs["v"])
np.testing.assert_array_equal(new["dense_inter"]["kernel"], arrs["di_k"])
np.testing.assert_array_equal(new["dense_out"]["kernel"], arrs["do_k"])
np.testing.assert_array_equal(
    stats["encoder"]["input_bn"]["mean"], arrs["bn_mm"])
checks["tensor_equality"] = "exact (embedding/lstm/attention/head/bn)"

# every one of the 360 per-group kernels in its bucket row, pad rows zero
n_checked = 0
for b, bucket in enumerate(layout.buckets):
    K = np.asarray(new["encoder"][f"kernel_{b}"])
    for row, gid in enumerate(bucket.group_ids):
        size = len(groups[gid])
        np.testing.assert_array_equal(K[row, :size], arrs[f"g{gid}k"])
        assert np.all(K[row, size:] == 0)
        n_checked += 1
assert n_checked == G
checks["group_kernels_scattered"] = n_checked

# ---- 4. greedy decode on the chip + reference artifact set -------------
print("decoding on the chip through imported weights...", flush=True)
variables = {"params": jax.tree_util.tree_map(jnp.asarray, new),
             "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)}
if jax.default_backend() == "tpu":
    from masters_thesis_tpu.ops.fused_decode import (
        make_whole_fused_greedy_decoder,
    )

    dec = make_whole_fused_greedy_decoder(
        model, cfg.units, cfg.max_length, batch_tile=64)
    t0 = time.perf_counter()
    words, alphas = dec(variables, betas, 3)
    words, alphas = np.asarray(words), np.asarray(alphas)
    decode_s = time.perf_counter() - t0
else:
    from masters_thesis_tpu.decode.greedy import make_greedy_decoder

    t0 = time.perf_counter()
    words, _, alphas = make_greedy_decoder(
        model, cfg.units, cfg.max_length)(variables, betas, 3)
    words, alphas = np.asarray(words), np.asarray(alphas)
    decode_s = time.perf_counter() - t0

assert words.shape == (B, cfg.max_length)
assert alphas.shape == (B, cfg.max_length, G)
assert (words < cfg.vocab_size).all() and np.isfinite(alphas).all()

out_dir = os.path.join("artifacts", "flagship_roundtrip_eval")
os.makedirs(out_dir, exist_ok=True)
e = 164  # the h5's epoch, reference eval.py filename convention
np.save(os.path.join(out_dir, f"output_captions_{e}.npy"), words)
np.save(os.path.join(out_dir, f"attention_scores_{e}.npy"),
        alphas.astype(np.float16))  # 64x15x360 fp16 keeps the artifact small
with open(os.path.join(out_dir, f"captions_{e}.txt"), "w") as fh:
    for i, row in enumerate(words):
        text = " ".join(f"w{int(t)}" for t in row if t not in (0,))
        fh.write(f"{i}\t{text}\n")

report = {
    "dims": {"n_voxels": N, "n_groups": G, "vocab": cfg.vocab_size,
             "units": cfg.units, "max_length": cfg.max_length},
    "h5_mb": round(h5_mb, 1),
    "checks": checks,
    "decode_backend": jax.default_backend(),
    "decode_batch": B,
    "decode_s": round(decode_s, 2),
    "artifacts": sorted(os.listdir(out_dir)),
    "wall_s": round(time.perf_counter() - t_start, 1),
}
os.makedirs("artifacts", exist_ok=True)
with open("artifacts/flagship_keras_roundtrip.json", "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps(report, indent=1))
