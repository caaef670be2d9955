import numpy as np

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.experiment import run_training
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.serve import Captioner
from masters_thesis_tpu.data.synthetic import synthetic_groups


def test_group_layout_save_load(tmp_path):
    groups = synthetic_groups(200, 4, seed=0)
    layout = GroupLayout(groups, 200)
    layout.save(str(tmp_path / "layout.npz"))
    restored = GroupLayout.load(str(tmp_path / "layout.npz"))
    assert restored.n_groups == 4
    for a, b in zip(layout.to_groups(), restored.to_groups()):
        np.testing.assert_array_equal(a, b)


def test_captioner_from_run_dir(shared_run):
    run_path, logs, bundle, cfg = shared_run()  # session-scoped lc_nic run

    cap = Captioner.from_run_dir(run_path, batch_size=4)
    n_voxels = bundle["store"].row_shape[0]
    betas = np.asarray(bundle["store"].data[:3], np.float32)
    texts = cap.caption(betas)
    assert len(texts) == 3

    # captions match decoding with the live bundle weights
    from masters_thesis_tpu.decode.greedy import make_greedy_decoder
    import jax.numpy as jnp

    dec = make_greedy_decoder(bundle["model"], cfg.units, cfg.max_length)
    # pad to the service batch like Captioner does
    padded = np.concatenate([betas, betas[-1:]])
    words, _, _ = dec(
        {"params": bundle["state"].params,
         "batch_stats": bundle["state"].batch_stats},
        jnp.asarray(padded), bundle["tokenizer"].start_id,
    )
    from masters_thesis_tpu.evalsuite.tokens import ids_to_caption

    expect = [ids_to_caption(w, bundle["tokenizer"]) for w in np.asarray(words)[:3]]
    assert texts == expect


def test_captioner_serves_rbg_trained_run(tmp_path):
    """Regression: a run trained with tpu.prng_impl='rbg' must restore
    through Captioner.from_run_dir — the serving template state has to be
    built under the run's PRNG impl (key shapes differ from threefry)."""
    import jax

    cfg = Config(run="serve_rbg", model="lc_nic", epochs=1, batch_size=4,
                 max_length=6, top_k=40, units=16, attn_units=8, group_size=4,
                 embedding_text=8, log=str(tmp_path))
    cfg.tpu.prng_impl = "rbg"
    try:
        run_path, _, bundle = run_training(cfg, epochs=1, smoke_keys=12)
        cap = Captioner.from_run_dir(run_path, batch_size=4)
        betas = np.asarray(bundle["store"].data[:2], np.float32)
        assert len(cap.caption(betas)) == 2
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")


def test_captioner_from_ms2_run_routes_one_encoder(shared_run):
    """ms2 runs serve through ONE subject's encoder (the split layout is a
    training batch contract): subject='a' and 'b' restore the split-trained
    checkpoint and produce per-encoder decodes."""
    from masters_thesis_tpu.models.multisubject import DualSubjectEncoder

    run_path, _, bundle, _cfg = shared_run(model="ms2_nic")
    betas = np.asarray(bundle["store"].data[:2], np.float32)
    for subject in ("a", "b"):
        cap = Captioner.from_run_dir(run_path, batch_size=4, subject=subject)
        enc = cap.model.encoder
        assert isinstance(enc, DualSubjectEncoder) and enc.mode == subject
        texts = cap.caption(betas)
        assert len(texts) == 2


def test_from_run_dir_restores_showtell_run(shared_run):
    """Non-layout families (ShowTell/ThinkAndTell/guse) restore against the
    TRAINED input width recorded in run_meta.json — cfg.input_dim() is a
    config constant the data can deviate from (synthetic smoke runs train
    2048-wide while input.full says 327,684; the old guess failed the orbax
    restore with a shape mismatch)."""
    run_path, _, bundle, cfg = shared_run(
        model="showtell", units=16, embedding_features=16)
    width = bundle["store"].row_shape[0]
    assert width != cfg.input_dim()  # the very case that used to fail
    cap = Captioner.from_run_dir(run_path, batch_size=4)
    assert cap.input_width == width
    texts = cap.caption(np.asarray(bundle["store"].data[:2], np.float32))
    assert len(texts) == 2


def test_from_run_dir_restores_img_patch_run(shared_run):
    """Image models serve (N, patches, channels) requests: the recorded
    row shape drives the restore template and the width guard checks the
    channel dim."""
    run_path, _, bundle, _cfg = shared_run(
        model="img_nic", embedding_features=32)
    row_shape = tuple(bundle["store"].row_shape)
    assert len(row_shape) == 2  # (patches, channels)
    cap = Captioner.from_run_dir(run_path, batch_size=4)
    assert cap.input_row_shape == row_shape
    assert cap.input_width == row_shape[-1]
    feats = np.asarray(bundle["store"].data[:2], np.float32)
    texts = cap.caption(feats)
    assert len(texts) == 2
