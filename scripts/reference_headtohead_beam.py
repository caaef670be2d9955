"""Head-to-head parity vs the reference's beam-search SOURCE.

The reference's only complete beam search is the soloist shrinking-frontier
procedure (soloist/Modified-Show-And-Tell-Keras/evaluate.py:103-189). Our
lattice beam (masters_thesis_tpu/decode/beam.py) re-designs it as a fixed
(B, W) scanned lattice for TPU; this harness proves the two SELECT THE SAME
HYPOTHESIS (tokens + normalised score) on the same model:

- the reference ``beam_search`` function object is extracted from the
  committed source via ast (it is pure numpy + math — no TF import needed)
  and driven through a ``.predict`` shim over OUR model's ``decode_step``,
  so both implementations consume bit-identical step distributions;
- part 1 runs a real (randomly initialised) small LcNIC over several
  widths — the realistic path;
- part 2 runs a deterministic table model whose ``<end>`` logit is boosted,
  forcing the frontier-semantics edge cases the lattice must reproduce:
  early finishes (shrinking frontier), first-loop-iteration finishes
  (score -inf, evaluate.py:163-166), <end>-as-seed (unchecked seed step,
  evaluate.py:114-127), and all-beams-finished early termination.

Prints ONE JSON line; tests/test_reference_parity.py::test_headtohead_beam
asserts zero mismatches.
"""

from __future__ import annotations

import ast
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF_EVAL = "/root/reference/soloist/Modified-Show-And-Tell-Keras/evaluate.py"

import numpy as np  # noqa: E402


def load_reference_beam_search(units: int):
    """Compile the reference's beam_search function from its own source.

    The function body only touches numpy, math and the module global
    ``unit_size`` (evaluate.py:110 assert), so it runs without TF/Keras.
    """
    with open(REF_EVAL) as f:
        tree = ast.parse(f.read())
    fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "beam_search"
    )
    mod = ast.Module(body=[fn], type_ignores=[])
    ns = {"np": np, "math": math, "unit_size": units}
    exec(compile(mod, REF_EVAL, "exec"), ns)
    return ns["beam_search"]


class TokStub:
    def __init__(self, start_id: int, end_id: int):
        self.word_index = {"startseq": start_id, "endseq": end_id}


class StepShim:
    """decoder_model.predict([a, words, c]) -> (probs, a', c') over OUR
    model's decode_step, with the per-sample features closed over (the
    soloist text decoder is feature-free — features enter via a0/c0;
    attention models need them every step, which the beam algorithm
    neither sees nor cares about)."""

    def __init__(self, model, variables, feat_one):
        self.model = model
        self.variables = variables
        self.feat_one = feat_one  # (1, ...) encoded features of one sample

    def predict(self, inputs, verbose=0):
        import jax
        import jax.numpy as jnp

        a, words, c = inputs
        n = np.asarray(words).shape[0]
        feat = jnp.broadcast_to(
            jnp.asarray(self.feat_one),
            (n,) + tuple(self.feat_one.shape[1:]),
        )
        h2, c2, logits, _ = self.model.apply(
            self.variables,
            jnp.asarray(a, jnp.float32),
            jnp.asarray(c, jnp.float32),
            feat,
            jnp.asarray(words, jnp.int32),
            method="decode_step",
        )
        probs = jax.nn.softmax(logits, axis=-1)
        return np.asarray(probs), np.asarray(h2), np.asarray(c2)


class TableModel:
    """Deterministic duck-typed model (same decode_step contract as NIC):
    logits = U @ tanh(h) + E[tok]; recurrence h' = tanh(A h + T[tok]).
    ``end_boost`` raises the <end> logit to force early finishes."""

    def __init__(self, units: int, vocab: int, end_id: int,
                 end_boost: float, seed: int):
        rng = np.random.default_rng(seed)
        self.units, self.vocab = units, vocab
        s = 1.0 / np.sqrt(units)
        self.U = (rng.standard_normal((units, vocab)) * 3 * s).astype("f4")
        self.E = (rng.standard_normal((vocab, vocab))).astype("f4")
        self.A = (rng.standard_normal((units, units)) * s).astype("f4")
        self.T = (rng.standard_normal((vocab, units))).astype("f4")
        self.P = (rng.standard_normal((4, units))).astype("f4")
        self.U[:, end_id] += end_boost / max(units, 1) ** 0.5
        self.E[:, end_id] += end_boost

    def apply(self, variables, *args, method=None):
        import jax.numpy as jnp

        if method == "encode":
            (x, _training) = args  # (B, 4)
            return jnp.asarray(x)[:, None, :]  # (B, 1, 4)
        if method == "init_carry":
            (feat,) = args  # (N, 1, 4)
            h = jnp.tanh(jnp.asarray(feat)[:, 0, :] @ jnp.asarray(self.P))
            return h, jnp.zeros_like(h)
        if method == "decode_step":
            h, c, feat, tok = args
            logits = (jnp.tanh(h) @ jnp.asarray(self.U)
                      + jnp.asarray(self.E)[tok])
            h2 = jnp.tanh(h @ jnp.asarray(self.A) + jnp.asarray(self.T)[tok])
            c2 = c
            alpha = jnp.zeros((h.shape[0], 1), logits.dtype)
            return h2, c2, logits, alpha
        raise ValueError(method)


def our_route(row, lengths_unused, end_id):
    """Lattice history row -> reference-style route: tokens before the
    first <end> at t>0 (an <end> seed at t=0 is an ordinary route token,
    matching the reference's unchecked seed step)."""
    row = list(np.asarray(row))
    out = []
    for t, tok in enumerate(row):
        if t > 0 and tok == end_id:
            break
        out.append(int(tok))
    return out


def compare_one(ref_beam, model, variables, feat_one, x_one, our_dec,
                start_id, end_id, width, max_len, units, stats):
    import jax.numpy as jnp

    shim = StepShim(model, variables, feat_one)
    h0, c0 = model.apply(variables, jnp.asarray(feat_one),
                         method="init_carry")
    res = ref_beam(shim, np.asarray(h0), np.asarray(c0),
                   TokStub(start_id, end_id), width, max_len)
    ref_scores = np.asarray(res["scores"], dtype=np.float64)
    ref_best = int(np.argmax(ref_scores))
    ref_score = float(ref_scores[ref_best])
    ref_route = [int(t) for t in res["routes"][ref_best]]

    toks, scores, _, hist, norm = our_dec(
        variables, jnp.asarray(x_one), start_id, end_id)
    our_score = float(np.asarray(scores)[0])
    route = our_route(np.asarray(toks)[0], None, end_id)

    # event accounting (the cases this harness exists to exercise)
    if any(r and r[0] == end_id for r in res["routes"]):
        stats["seed_end_cases"] += 1
    if np.isinf(ref_scores).any():
        stats["deadend_cases"] += 1
    if any(len(r) < max_len for r in res["routes"]):
        stats["early_finish_cases"] += 1

    if ref_score == -math.inf:
        # every route dead-ended: ours must agree nothing scores above -inf
        ok_score = our_score <= -1e8
        ok_tokens = True
        stats["all_deadend_cases"] += 1
    else:
        ok_score = abs(ref_score - our_score) < 1e-4 * max(
            1.0, abs(ref_score))
        # equal-score ties may legitimately pick different routes
        # (reference argmax order: finish order, then frontier order;
        # lattice argmax: beam-slot order)
        n_ties = int(np.sum(np.abs(ref_scores - ref_score) < 1e-6))
        ok_tokens = route == ref_route or (ok_score and n_ties > 1)
        if ok_tokens and route != ref_route:
            stats["tie_cases"] += 1
        stats["max_score_diff"] = max(
            stats["max_score_diff"], abs(ref_score - our_score))
    if not ok_score:
        stats["score_mismatches"] += 1
        stats.setdefault("examples", []).append(
            {"width": width, "ref": ref_score, "ours": our_score})
    if not ok_tokens:
        stats["token_mismatches"] += 1
        stats.setdefault("examples", []).append(
            {"width": width, "ref_route": ref_route, "our_route": route})
    stats["samples"] += 1


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.data.synthetic import synthetic_dataset
    from masters_thesis_tpu.decode.beam import make_beam_decoder
    from masters_thesis_tpu.models.nic import LcNIC
    from masters_thesis_tpu.ops.group_layout import GroupLayout
    from masters_thesis_tpu.train.state import init_model

    stats = {
        "samples": 0, "token_mismatches": 0, "score_mismatches": 0,
        "max_score_diff": 0.0, "tie_cases": 0, "early_finish_cases": 0,
        "deadend_cases": 0, "all_deadend_cases": 0, "seed_end_cases": 0,
    }

    # ---- part 1: real small LcNIC ------------------------------------
    cfg = Config(top_k=24, batch_size=4, max_length=8, units=16,
                 attn_units=8, group_size=4, embedding_text=8)
    _, _, tok, store, groups = synthetic_dataset(
        n_keys=12, n_voxels=64, n_groups=4, top_k=cfg.top_k)
    model = LcNIC(
        layout=GroupLayout(groups, n_voxels=64), units=cfg.units,
        group_size=cfg.group_size, embedding_text=cfg.embedding_text,
        attn_units=cfg.attn_units, vocab_size=cfg.vocab_size,
        max_length=cfg.max_length,
    )
    betas = store.gather_host(np.arange(12, dtype=np.int32))
    params, bstats, _ = init_model(
        model, cfg, betas[:4], np.zeros((4, cfg.max_length), np.int32))
    variables = {"params": params, "batch_stats": bstats}

    for width in (1, 2, 3, 5):
        dec = make_beam_decoder(model, cfg.units, cfg.max_length,
                                beam_width=width)
        for i in range(8):
            x = betas[i: i + 1]
            feat = model.apply(variables, jnp.asarray(x), False,
                               method="encode")
            compare_one(load_reference_beam_search(cfg.units), model,
                        variables, np.asarray(feat), x, dec,
                        tok.start_id, tok.end_id, width, cfg.max_length,
                        cfg.units, stats)

    # ---- part 2: table model with boosted <end> ----------------------
    UNITS, VOCAB, MAXLEN = 8, 12, 6
    start_id, end_id = 1, 2
    rng = np.random.default_rng(0)
    for seed in range(6):
        for boost in (0.0, 2.5, 5.0):
            tm = TableModel(UNITS, VOCAB, end_id, boost, seed)
            xs = rng.standard_normal((4, 4)).astype("f4")
            for width in (2, 3, 5):
                dec = make_beam_decoder(tm, UNITS, MAXLEN, beam_width=width)
                for i in range(2):
                    x = xs[i: i + 1]
                    feat = tm.apply(None, x, False, method="encode")
                    compare_one(load_reference_beam_search(UNITS), tm,
                                None, np.asarray(feat), x, dec,
                                start_id, end_id, width, MAXLEN, UNITS,
                                stats)

    stats["max_score_diff"] = float(stats["max_score_diff"])
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
