import numpy as np

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_dataset
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.serve import Captioner
from masters_thesis_tpu.train.state import init_model


def test_captioner_greedy_and_beam():
    cfg = Config(top_k=40, batch_size=4, max_length=6, units=16, attn_units=8,
                 group_size=4, embedding_text=8)
    split, pairs, tok, store, groups = synthetic_dataset(
        n_keys=8, n_voxels=64, n_groups=3, top_k=cfg.top_k
    )
    layout = GroupLayout(groups, 64)
    model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
                  embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
                  vocab_size=cfg.vocab_size, max_length=cfg.max_length)
    betas = store.gather_host(np.arange(6, dtype=np.int32))
    tokens = np.zeros((4, cfg.max_length), np.int32)
    params, bstats, _ = init_model(model, cfg, betas[:4], tokens)

    cap = Captioner.from_components(
        model, params, bstats, tok, cfg.units, cfg.max_length, batch_size=4
    )
    # 6 inputs with service batch 4: exercises the padding path
    texts = cap.caption(betas)
    assert len(texts) == 6
    assert all(isinstance(t, str) for t in texts)
    # identical inputs -> identical captions (deterministic greedy)
    t2 = cap.caption(betas)
    assert texts == t2
    beam_texts = cap.caption(betas, decoder="beam")
    assert len(beam_texts) == 6


def test_captioner_sampling_decoder():
    """decoder='sample': seed-deterministic stochastic captions (the
    CNN_RNN evaluate loop's categorical decode, CNN_RNN/train.py:343-369)."""
    cfg = Config(top_k=40, batch_size=4, max_length=6, units=16, attn_units=8,
                 group_size=4, embedding_text=8)
    split, pairs, tok, store, groups = synthetic_dataset(
        n_keys=8, n_voxels=64, n_groups=3, top_k=cfg.top_k
    )
    layout = GroupLayout(groups, 64)
    model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
                  embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
                  vocab_size=cfg.vocab_size, max_length=cfg.max_length)
    betas = store.gather_host(np.arange(4, dtype=np.int32))
    tokens = np.zeros((4, cfg.max_length), np.int32)
    params, bstats, _ = init_model(model, cfg, betas, tokens)

    def build(seed, **kw):
        return Captioner.from_components(
            model, params, bstats, tok, cfg.units, cfg.max_length,
            batch_size=4, seed=seed, **kw,
        )

    a = build(0).caption(betas, decoder="sample")
    assert len(a) == 4 and all(isinstance(t, str) for t in a)
    # same seed -> same stream; fresh Captioner replays it
    assert build(0).caption(betas, decoder="sample") == a
    # different seed -> (almost surely) different captions
    assert build(1).caption(betas, decoder="sample") != a
    # consecutive requests advance the stream (not frozen)
    c = build(0)
    first = c.caption(betas, decoder="sample")
    second = c.caption(betas, decoder="sample")
    assert first == a and second != first
    # top-k=1 sampling degenerates to greedy
    g = build(0).caption(betas, decoder="greedy")
    s1 = build(0, sample_top_k=1).caption(betas, decoder="sample")
    assert s1 == g


def test_captioner_validation_errors():
    """Misuse fails loudly at construction, not at caption time."""
    import jax
    import pytest
    from jax.sharding import Mesh

    from masters_thesis_tpu.decode.sampling import make_sampling_decoder
    from masters_thesis_tpu.parallel.mesh import make_mesh

    cfg = Config(top_k=40, batch_size=4, max_length=6, units=16, attn_units=8,
                 group_size=4, embedding_text=8)
    split, pairs, tok, store, groups = synthetic_dataset(
        n_keys=8, n_voxels=64, n_groups=3, top_k=cfg.top_k
    )
    layout = GroupLayout(groups, 64)
    model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
                  embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
                  vocab_size=cfg.vocab_size, max_length=cfg.max_length)
    betas = store.gather_host(np.arange(4, dtype=np.int32))
    params, bstats, _ = init_model(
        model, cfg, betas, np.zeros((4, cfg.max_length), np.int32)
    )

    # temperature <= 0 would NaN inside categorical: refused up front
    with pytest.raises(ValueError, match="temperature"):
        make_sampling_decoder(model, cfg.units, cfg.max_length, temperature=0.0)

    # top_k beyond the vocab would IndexError inside the jitted scan
    with pytest.raises(ValueError, match="top_k"):
        make_sampling_decoder(model, cfg.units, cfg.max_length,
                              top_k=cfg.vocab_size + 1)

    # mesh without a 'data' axis: refused at construction
    import numpy as _np

    no_data = Mesh(_np.asarray(jax.devices()), axis_names=("x",))
    with pytest.raises(ValueError, match="data"):
        Captioner.from_components(
            model, params, bstats, tok, cfg.units, cfg.max_length,
            mesh=no_data,
        )

    # the fused kernel is single-chip: explicit use_fused=True + mesh is
    # a contradiction, not a silent downgrade
    mesh = make_mesh(data=len(jax.devices()), model=1)
    with pytest.raises(ValueError, match="use_fused"):
        Captioner.from_components(
            model, params, bstats, tok, cfg.units, cfg.max_length,
            mesh=mesh, use_fused=True,
        )


def test_captioner_sharded_serving_matches_single_device():
    """DP serving over a ('data',) mesh: params replicated, batch axis
    sharded, same captions as the single-device path (new TPU surface —
    the reference has no parallelism, SURVEY.md §2.7)."""
    import jax

    from masters_thesis_tpu.parallel.mesh import make_mesh

    cfg = Config(top_k=40, batch_size=4, max_length=6, units=16, attn_units=8,
                 group_size=4, embedding_text=8)
    split, pairs, tok, store, groups = synthetic_dataset(
        n_keys=8, n_voxels=64, n_groups=3, top_k=cfg.top_k
    )
    layout = GroupLayout(groups, 64)
    model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
                  embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
                  vocab_size=cfg.vocab_size, max_length=cfg.max_length)
    betas = store.gather_host(np.arange(7, dtype=np.int32))
    tokens = np.zeros((4, cfg.max_length), np.int32)
    params, bstats, _ = init_model(model, cfg, betas[:4], tokens)

    single = Captioner.from_components(
        model, params, bstats, tok, cfg.units, cfg.max_length, batch_size=4
    )
    mesh = make_mesh(data=len(jax.devices()), model=1)
    sharded = Captioner.from_components(
        model, params, bstats, tok, cfg.units, cfg.max_length, batch_size=4,
        mesh=mesh,
    )
    # batch rounds up to a multiple of the data axis
    assert sharded.batch_size % mesh.shape["data"] == 0

    for decoder in ("greedy", "beam"):
        ref = single.caption(betas, decoder=decoder)
        got = sharded.caption(betas, decoder=decoder)
        assert got == ref, decoder

    # sample: categorical draws depend on the padded batch shape (one
    # per-step Gumbel draw over the whole service batch), so parity needs
    # the same service batch size — the mesh rounded 4 up to 8
    single8 = Captioner.from_components(
        model, params, bstats, tok, cfg.units, cfg.max_length,
        batch_size=sharded.batch_size,
    )
    assert (sharded.caption(betas, decoder="sample")
            == single8.caption(betas, decoder="sample"))

    # the decode really ran sharded: batch axis of the word ids spans
    # the mesh (output sharding follows the P('data') inputs)
    full = np.repeat(betas, 2, axis=0)[: sharded.batch_size]
    ids = sharded.caption_ids(full)
    assert ids.shape == (sharded.batch_size, cfg.max_length)


def test_captioner_empty_input():
    """A request whose rows were all filtered upstream returns an empty
    (0, T) matrix / empty list instead of np.concatenate([]) raising."""
    cfg = Config(top_k=40, batch_size=4, max_length=6, units=16, attn_units=8,
                 group_size=4, embedding_text=8)
    split, pairs, tok, store, groups = synthetic_dataset(
        n_keys=8, n_voxels=64, n_groups=3, top_k=cfg.top_k
    )
    layout = GroupLayout(groups, 64)
    model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
                  embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
                  vocab_size=cfg.vocab_size, max_length=cfg.max_length)
    betas = store.gather_host(np.arange(4, dtype=np.int32))
    tokens = np.zeros((4, cfg.max_length), np.int32)
    params, bstats, _ = init_model(model, cfg, betas, tokens)
    cap = Captioner.from_components(
        model, params, bstats, tok, cfg.units, cfg.max_length, batch_size=4
    )
    ids = cap.caption_ids(np.zeros((0, 64), np.float32))
    assert ids.shape == (0, cfg.max_length)
    assert cap.caption(np.zeros((0, 64), np.float32)) == []
