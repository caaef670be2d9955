"""Config-selectable glove_NIC and init-from-features (tmp_lc_NIC) variants.

The reference reaches these by swapping model imports in the train script
(AttemptFour/Model/glove_NIC.py; tmp_lc_NIC.py:191); here they are config
keys: ``glove_path`` / ``glove_trainable`` and ``learned_init_state``.
"""

import numpy as np
import pytest

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.experiment import (
    build_model,
    resolve_glove_table,
    run_eval,
    run_training,
)


def _cfg(tmp_path, **over):
    cfg = Config(run="variant_t", model="lc_nic", epochs=1, batch_size=4,
                 max_length=6, top_k=40, units=16, attn_units=8, group_size=4,
                 embedding_text=8, log=str(tmp_path))
    for k, v in over.items():
        setattr(cfg, k, v)
    return cfg


def _glove_npy(tmp_path, cfg, seed=0):
    rng = np.random.default_rng(seed)
    table = rng.standard_normal(
        (cfg.vocab_size, cfg.embedding_text)).astype(np.float32)
    path = tmp_path / "glove.npy"
    np.save(path, table)
    return str(path), table


# ---- resolve_glove_table ----

def test_resolve_prebuilt_npy(tmp_path):
    cfg = _cfg(tmp_path)
    path, table = _glove_npy(tmp_path, cfg)
    cfg.glove_path = path
    got = resolve_glove_table(cfg, tokenizer=None)  # npy path needs no tok
    np.testing.assert_array_equal(got, table)


def test_resolve_txt_builds_against_tokenizer(tmp_path):
    from masters_thesis_tpu.data.tokenizer import Tokenizer

    tok = Tokenizer(num_words=40)
    tok.fit_on_texts(["<start> red cat on mat <end>"] * 3)
    cfg = _cfg(tmp_path)
    dim = cfg.embedding_text
    txt = tmp_path / "glove.txt"
    vec = " ".join(["0.5"] * dim)
    txt.write_text(f"cat {vec}\nunrelatedword {vec}\n")
    cfg.glove_path = str(txt)
    table = resolve_glove_table(cfg, tok)
    assert table.shape == (cfg.vocab_size, dim)
    np.testing.assert_allclose(table[tok.word_index["cat"]], 0.5)
    # <start>/<end> carry the reference's synthetic basis vectors
    assert table[tok.word_index["<start>"], 0] == 1.0
    assert table[tok.word_index["<end>"], -1] == 1.0


def test_resolve_shape_mismatch_raises(tmp_path):
    cfg = _cfg(tmp_path)
    bad = tmp_path / "bad.npy"
    np.save(bad, np.zeros((3, cfg.embedding_text), np.float32))
    cfg.glove_path = str(bad)
    with pytest.raises(ValueError, match="glove table"):
        resolve_glove_table(cfg, tokenizer=None)


def test_empty_glove_path_is_none(tmp_path):
    assert resolve_glove_table(_cfg(tmp_path), tokenizer=None) is None


def test_txt_dimension_mismatch_raises_not_zero_table(tmp_path):
    """A GloVe file whose vectors aren't embedding_text-wide must refuse —
    silently skipping every line yields an all-zeros table that trains to
    completion with meaningless embeddings."""
    from masters_thesis_tpu.data.tokenizer import Tokenizer

    tok = Tokenizer(num_words=40)
    tok.fit_on_texts(["<start> red cat <end>"] * 3)
    cfg = _cfg(tmp_path)  # embedding_text = 8
    txt = tmp_path / "glove300.txt"
    txt.write_text("cat " + " ".join(["0.5"] * 300) + "\n")
    cfg.glove_path = str(txt)
    with pytest.raises(ValueError, match="300-d"):
        resolve_glove_table(cfg, tok)


def test_resume_keeps_persisted_glove_table(tmp_path):
    """On --resume the run dir's glove_table.npy is authoritative: the
    source file may have changed since training, and re-resolving would
    silently overwrite the provenance copy the frozen weights trained
    against."""
    import os

    cfg = _cfg(tmp_path, glove_trainable=False)
    cfg.glove_path, table = _glove_npy(tmp_path, cfg, seed=0)
    run_path, _, _ = run_training(cfg, epochs=1, smoke_keys=12)
    persisted = os.path.join(run_path, "glove_table.npy")
    np.testing.assert_array_equal(np.load(persisted), table)

    # source table changes on disk after training
    _, table2 = _glove_npy(tmp_path, cfg, seed=1)
    assert not np.array_equal(table, table2)

    run_path2, _, bundle = run_training(cfg, epochs=0, resume=True)
    assert run_path2 == run_path
    np.testing.assert_array_equal(np.load(persisted), table)  # untouched
    # and the resumed model runs with the persisted table, not the new file
    emb = bundle["model"].pretrained_embedding
    np.testing.assert_array_equal(np.asarray(emb), table)


# ---- build_model wiring ----

def test_build_model_embedding_initialised_from_table(tmp_path):
    from masters_thesis_tpu.data.synthetic import synthetic_dataset
    from masters_thesis_tpu.train.state import init_model

    cfg = _cfg(tmp_path)
    _, table = _glove_npy(tmp_path, cfg)
    split, pairs, tok, store, groups = synthetic_dataset(
        n_keys=12, n_voxels=64, n_groups=4, top_k=cfg.top_k)
    model, _, _ = build_model(cfg, groups, 64, embedding_table=table)
    betas = np.asarray(store.data[:4], np.float32)
    tokens = np.zeros((4, cfg.max_length), np.int32)
    params, bstats, _ = init_model(model, cfg, betas, tokens)
    np.testing.assert_array_equal(np.asarray(params["embedding"]), table)


def test_glove_rejected_for_non_lc_models(tmp_path):
    cfg = _cfg(tmp_path, model="showtell")
    table = np.zeros((cfg.vocab_size, cfg.embedding_text), np.float32)
    with pytest.raises(ValueError, match="glove_path"):
        build_model(cfg, [], 64, embedding_table=table)


def test_learned_init_rejected_for_showtell_family(tmp_path):
    cfg = _cfg(tmp_path, model="showtell", learned_init_state=True)
    with pytest.raises(ValueError, match="learned_init_state"):
        build_model(cfg, [], 64)


# ---- end to end ----

def test_glove_frozen_trains_and_serves(tmp_path):
    """glove_trainable=false: the table is a module constant (not a
    checkpointed param) — serving must rebuild from glove_table.npy."""
    import os

    from masters_thesis_tpu.serve import Captioner

    cfg = _cfg(tmp_path, glove_trainable=False)
    cfg.glove_path, table = _glove_npy(tmp_path, cfg)
    run_path, logs, bundle = run_training(cfg, epochs=1, smoke_keys=12)
    assert "loss" in logs
    assert os.path.exists(os.path.join(run_path, "glove_table.npy"))
    params = bundle["state"].params
    assert "embedding" not in params  # frozen: module constant

    cap = Captioner.from_run_dir(run_path, batch_size=4)
    texts = cap.caption(np.asarray(bundle["store"].data[:2], np.float32))
    assert len(texts) == 2


def test_glove_trainable_run_decodes(tmp_path):
    cfg = _cfg(tmp_path)
    cfg.glove_path, table = _glove_npy(tmp_path, cfg)
    run_path, logs, bundle = run_training(cfg, epochs=1, smoke_keys=12)
    assert "embedding" in bundle["state"].params
    out = run_eval(bundle, run_path, epoch=1)
    assert out["words"].shape[1] == cfg.max_length


def test_learned_init_state_trains_and_decodes(tmp_path):
    cfg = _cfg(tmp_path, learned_init_state=True)
    run_path, logs, bundle = run_training(cfg, epochs=1, smoke_keys=12)
    params = bundle["state"].params
    assert "hidden_init" in params and "carry_init" in params
    out = run_eval(bundle, run_path, epoch=1)
    assert out["words"].shape[1] == cfg.max_length

    # config round-trips through the run dir snapshot
    snap = Config.load(f"{run_path}/config.yaml")
    assert snap.learned_init_state is True
