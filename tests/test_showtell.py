import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.decode.beam import make_beam_decoder
from masters_thesis_tpu.decode.greedy import make_greedy_decoder
from masters_thesis_tpu.models.showtell import GuseNIC, ShowTell, showtell_l2_rules
from masters_thesis_tpu.train.optim import make_optimizer
from masters_thesis_tpu.train.state import TrainState, init_model
from masters_thesis_tpu.train.steps import make_eval_step, make_train_step


@pytest.fixture(scope="module")
def st_setup():
    cfg = Config(top_k=40, batch_size=4, max_length=6, units=16,
                 embedding_text=8, input_kind="mscoco")
    model = ShowTell(
        units=cfg.units, embed_dim=8, embedding_text=cfg.embedding_text,
        vocab_size=cfg.vocab_size, max_length=cfg.max_length,
    )
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((4, 20)).astype(np.float32)
    tokens = rng.integers(1, cfg.vocab_size, (4, cfg.max_length)).astype(np.int32)
    params, bstats, prng = init_model(model, cfg, feats, tokens)
    tx = make_optimizer(cfg)
    state = TrainState.create(params=params, batch_stats=bstats, tx=tx, rng=prng)
    return cfg, model, state, jnp.asarray(feats), jnp.asarray(tokens)


def test_showtell_forward_shapes(st_setup):
    cfg, model, state, feats, tokens = st_setup
    a0 = jnp.zeros((4, cfg.units))
    logits, attn = model.apply(
        {"params": state.params}, feats, tokens, a0, a0, training=False
    )
    assert logits.shape == (4, cfg.max_length, cfg.vocab_size)


def test_showtell_train_decode_alignment(st_setup):
    """Vinyals alignment (ShowAndTell/model.py:145-158): training logits[t]
    come from the state that consumed [feat, tok_0..tok_t] — the SAME
    state->next-word contract the decoders use. logits[:, 0] depends on
    feat and tokens[:, 0] only, and equals what init_carry + one
    decode_step produce."""
    cfg, model, state, feats, tokens = st_setup
    a0 = jnp.zeros((4, cfg.units))
    l1, _ = model.apply({"params": state.params}, feats, tokens, a0, a0)
    # changing tokens AFTER position 0 cannot affect logits[:, 0]
    other = tokens.at[:, 1:].set(jnp.roll(tokens[:, 1:], 1, axis=1))
    l2, _ = model.apply({"params": state.params}, feats, other, a0, a0)
    np.testing.assert_allclose(l1[:, 0], l2[:, 0], rtol=1e-6)
    # but changing tokens[:, 0] must
    first = tokens.at[:, 0].set((tokens[:, 0] + 1) % cfg.vocab_size)
    l3, _ = model.apply({"params": state.params}, feats, first, a0, a0)
    assert not np.allclose(l1[:, 0], l3[:, 0])

    # TRAIN state t == DECODE state t: priming with feat then stepping
    # tokens[:, 0] reproduces the training forward's first logits
    variables = {"params": state.params}
    enc = model.apply(variables, feats, False, method="encode")
    h, c = model.apply(variables, enc, method="init_carry")
    _, _, dec_logits, _ = model.apply(
        variables, h, c, enc, tokens[:, 0], method="decode_step")
    np.testing.assert_allclose(np.asarray(dec_logits), np.asarray(l1[:, 0]),
                               rtol=1e-5, atol=1e-6)


def test_showtell_masked_training_reduces_loss(st_setup):
    cfg, model, state, feats, tokens = st_setup
    target = jnp.concatenate(
        [tokens[:, 1:], jnp.zeros((4, 1), jnp.int32)], axis=1
    )
    rules = showtell_l2_rules(cfg)
    step = make_train_step(model, cfg, rules, masked=True, donate=False)
    losses = []
    for _ in range(10):
        state, m = step(state, feats, tokens, target)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    estep = make_eval_step(model, cfg, rules, masked=True)
    em = estep(state, feats, tokens, target)
    assert np.isfinite(float(em["loss"]))


def test_showtell_greedy_and_beam(st_setup):
    cfg, model, state, feats, tokens = st_setup
    variables = {"params": state.params}
    greedy = make_greedy_decoder(model, cfg.units, cfg.max_length)
    words, logits, _ = greedy(variables, feats, 3)
    assert words.shape == (4, cfg.max_length)
    beam = make_beam_decoder(model, cfg.units, cfg.max_length, beam_width=2)
    bw, scores, alphas, hist, norm = beam(variables, feats, 3, 4)
    assert bw.shape == (4, cfg.max_length)
    # attention-free model still returns a placeholder trail
    assert alphas.shape == (4, cfg.max_length, 1)


def test_guse_nic_conditions_on_vector():
    cfg = Config(top_k=30, batch_size=2, max_length=5, units=8)
    model = GuseNIC(units=cfg.units, vocab_size=cfg.vocab_size,
                    max_length=cfg.max_length)
    rng = np.random.default_rng(1)
    guse = rng.standard_normal((2, 512)).astype(np.float32)
    tokens = rng.integers(1, cfg.vocab_size, (2, 5)).astype(np.int32)
    params, bstats, prng = init_model(model, cfg, guse, tokens)
    a0 = jnp.zeros((2, cfg.units))
    logits, _ = model.apply({"params": params}, guse, tokens, a0, a0)
    assert logits.shape == (2, 5, cfg.vocab_size)
    # different guse vectors -> different first predictions
    l2, _ = model.apply({"params": params}, guse[::-1], tokens, a0, a0)
    assert not np.allclose(logits[:, 0], l2[:, 0])


def test_analyze_skips_attention_artifacts_for_attention_free_run(tmp_path,
                                                                  capsys):
    """ShowTell-family eval writes (B, T, 1) attention placeholders; analyze
    must say so instead of emitting meaningless region_0/0.0 figures."""
    import json

    from masters_thesis_tpu.cli import main
    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.experiment import run_eval, run_training

    cfg = Config(run="st_analyze", model="showtell", epochs=1, batch_size=4,
                 max_length=6, top_k=40, units=16, embedding_features=16,
                 log=str(tmp_path))
    run_path, _, bundle = run_training(cfg, epochs=1, smoke_keys=12)
    run_eval(bundle, run_path, epoch=1)
    assert main(["analyze", "--run", run_path]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "attention_note" in report
    assert not any("region_attention" in a or "attention_over_time" in a
                   for a in report["artifacts"])
