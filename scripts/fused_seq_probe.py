"""North-star fused TRAIN step measurement (round 5, VERDICT r4 item 2).

Measures the teacher-forced decoder fwd+bwd (attention + LSTM + head +
CCE, eval-mode numerics) three ways on the chip, at BOTH the flagship
reference dims and the MXU-friendly ladder dims (PERF.md "MFU ladder"):

  ref_xla_autodiff   the production structure: lax.scan forward,
                     XLA-autodiff backward (in-loop weight-grad
                     accumulators, batch-thin per-step grad matmuls)
  vjp_xla_fwd        ops/fused_seq custom VJP, XLA scan forward: backward
                     carries only (dh, dc); every weight grad is one
                     stacked (B*T)-row einsum after the scan
  vjp_pallas_fwd     same VJP, whole-sequence Pallas forward (grid
                     (batch-tiles, T), carry in VMEM scratch)

Protocol follows mfu_scaled_decomp_probe: K steps per device call with the
token batch VARIED per iteration (LICM hoists a loop-invariant grad body),
the ENTIRE gradient tree consumed (XLA dead-code-eliminates unused
weight-grad matmuls), 3 timed reps after a warm call. Writes
artifacts/fused_seq_probe.json and prints ms/step + decoder TF/s.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E402,E702
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_groups
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.fused_seq import make_fused_sequence
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.train.state import init_model
from masters_thesis_tpu.models.common import leaky_relu

K = int(os.environ.get("MTT_FSEQ_K", "8"))
results = {}


def _consume(g):
    return sum(jnp.sum(jnp.square(l)) for l in jax.tree_util.tree_leaves(g))


def dec_flops(B, T, R, D, U, A, E, H, V):
    """Useful matmul FLOPs of one decoder fwd+bwd (3x fwd convention)."""
    attn = (2 * R * D * A + 2 * U * A + 2 * R * A + 2 * R * D)
    lstm = 2 * (D + E + U) * 4 * U
    head = 2 * U * H + 2 * H * V
    return 3.0 * B * T * (attn + lstm + head)


def run_shape(tag, cfg, n_groups, head_dim):
    print(f"--- {tag}: units={cfg.units} groups={n_groups}x"
          f"{cfg.group_size} head={head_dim} vocab={cfg.vocab_size} "
          f"batch={cfg.batch_size} ---", flush=True)
    B, T = cfg.batch_size, cfg.max_length
    R, D, U, A, E = (n_groups, cfg.group_size, cfg.units, cfg.attn_units,
                     cfg.embedding_text)
    V = cfg.vocab_size
    rng = np.random.default_rng(0)
    n_vox = 4096  # tiny encoder input: the probe isolates the DECODER
    groups = synthetic_groups(n_voxels=n_vox, n_groups=n_groups, seed=0)
    model = LcNIC(layout=GroupLayout(groups, n_voxels=n_vox),
                  units=U, group_size=D, embedding_text=E, attn_units=A,
                  vocab_size=V, max_length=T, head_dim=head_dim)
    betas = jnp.asarray(rng.standard_normal((B, n_vox)), jnp.float32)
    tok_table = jnp.asarray(
        rng.integers(1, V, (K, B, T)), jnp.int32)
    params, bstats, _ = init_model(model, cfg, betas, tok_table[0])
    feats = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (B, R, D), jnp.float32))()
    a0 = jnp.zeros((B, U), jnp.float32)
    flops = dec_flops(B, T, R, D, U, A, E, head_dim, V)

    def _cce(logits, tokens):
        oh = jax.nn.one_hot(tokens, V)
        return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(logits), -1))

    # ---- reference: production scan structure, XLA autodiff ----
    # (the exact __call__ body minus encoder/dropout: W1 applied inside the
    # scan like nn.scan does — XLA's LICM treats both the same way)
    def ref_loss(p, tokens):
        emb = jnp.take(p["embedding"], tokens, axis=0)

        def body(carry, et):
            h, c = carry
            hw = leaky_relu(h @ p["attention"]["W2"]["kernel"]
                            + p["attention"]["W2"]["bias"])
            pre = leaky_relu(feats @ p["attention"]["W1"]["kernel"]
                             + p["attention"]["W1"]["bias"])
            s = jnp.tanh(pre + hw[:, None, :])
            e = s @ p["attention"]["V"]["kernel"][:, 0] + (
                p["attention"]["V"]["bias"][0])
            alpha = jax.nn.softmax(e, axis=1)
            ctx = jnp.einsum("br,brd->bd", alpha, feats)
            x = jnp.concatenate([ctx, et], axis=-1)
            z = (x @ p["lstm"]["kernel"] + h @ p["lstm"]["recurrent_kernel"]
                 + p["lstm"]["bias"])
            i, f, g, o = jnp.split(z, 4, axis=-1)
            c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
            return (h2, c2), h2

        _, hs = jax.lax.scan(body, (a0, a0), jnp.moveaxis(emb, 1, 0))
        hs = jnp.moveaxis(hs, 0, 1)
        hi = leaky_relu(hs @ p["dense_inter"]["kernel"]
                        + p["dense_inter"]["bias"])
        logits = hi @ p["dense_out"]["kernel"] + p["dense_out"]["bias"]
        return _cce(logits, tokens)

    def fused_loss_fn(backend):
        seq = make_fused_sequence(attn_slope=0.2, backend=backend,
                                  batch_tile=min(64, B))

        def loss(p, tokens):
            emb = jnp.take(p["embedding"], tokens, axis=0)
            pre = leaky_relu(feats @ p["attention"]["W1"]["kernel"]
                             + p["attention"]["W1"]["bias"])
            w = {"w2": p["attention"]["W2"]["kernel"],
                 "b2": p["attention"]["W2"]["bias"],
                 "v": p["attention"]["V"]["kernel"][:, 0],
                 "bv": p["attention"]["V"]["bias"][0],
                 "wx": p["lstm"]["kernel"],
                 "wh": p["lstm"]["recurrent_kernel"],
                 "b": p["lstm"]["bias"]}
            hs, _ = seq(w, pre, feats, emb)
            hi = leaky_relu(hs @ p["dense_inter"]["kernel"]
                            + p["dense_inter"]["bias"])
            logits = hi @ p["dense_out"]["kernel"] + p["dense_out"]["bias"]
            return _cce(logits, tokens)

        return loss

    def timed(name, loss):
        @jax.jit
        def scan(p, toks):
            def body(c, tk):
                return c + _consume(jax.grad(loss)(p, tk)), None
            return jax.lax.scan(body, 0.0, toks)[0]

        try:
            float(np.asarray(scan(params, tok_table)))
        except Exception as exc:
            msg = str(exc).splitlines()[0][:160]
            results[f"{tag}/{name}"] = {"error": msg}
            print(f"{name:20s}: FAILED ({msg})", flush=True)
            return
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            float(np.asarray(scan(params, tok_table)))
        ms = (time.perf_counter() - t0) / (reps * K) * 1e3
        tf = flops / (ms / 1e3) / 1e12
        results[f"{tag}/{name}"] = {"ms_per_step": round(ms, 3),
                                    "tflops_per_sec": round(tf, 2)}
        print(f"{name:20s}: {ms:8.3f} ms/step  {tf:6.2f} TF/s", flush=True)

    timed("ref_xla_autodiff", ref_loss)
    timed("vjp_xla_fwd", fused_loss_fn("xla"))
    timed("vjp_pallas_fwd", fused_loss_fn("pallas"))


flag = Config()
run_shape("flagship", flag, n_groups=360, head_dim=256)

mxu = Config()
mxu.units = 2048
mxu.attn_units = 256
mxu.group_size = 128
mxu.embedding_text = 1024
mxu.top_k = 8191
mxu.batch_size = 256
run_shape("mxu", mxu, n_groups=360, head_dim=2048)

os.makedirs("artifacts", exist_ok=True)
with open("artifacts/fused_seq_probe.json", "w") as f:
    json.dump({"k_per_call": K, "results": results}, f, indent=1)
print(json.dumps(results, indent=1))
