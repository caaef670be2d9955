"""GUSE precompute driver + nearest-training-caption retrieval
(reference: AttemptFour/get_guse.py __main__ and guse_comparison.py)."""

import json
import os

import numpy as np
import pytest

from masters_thesis_tpu.evalsuite.guse_sim import (
    HashEmbedder,
    embed_caption_table,
    guse_clean,
    nearest_training_captions,
)


def test_guse_clean_matches_reference_recipe():
    # get_guse.py:39-42: '.'/',' -> space, lowercase, drop empties
    assert guse_clean("A dog. Runs,fast ") == "a dog runs fast"
    assert guse_clean("") == ""


def test_embed_caption_table_shape_and_determinism():
    caps = {7: ["a cat", "the cat"], 3: ["a dog", "the dog"]}
    emb = HashEmbedder(dim=32)
    keys, table = embed_caption_table(caps, embedder=emb)
    assert list(keys) == [3, 7]  # sorted
    assert table.shape == (2, 2, 32)
    keys2, table2 = embed_caption_table(caps, embedder=emb)
    np.testing.assert_array_equal(table, table2)
    # row order follows the key order: table[1] embeds key 7's captions
    direct = emb.embed([guse_clean("a cat"), guse_clean("the cat")])
    np.testing.assert_allclose(table[1], direct, rtol=1e-6)


def test_embed_caption_table_rejects_ragged_counts():
    caps = {1: ["a", "b"], 2: ["c"]}
    with pytest.raises(ValueError, match="ragged"):
        embed_caption_table(caps, embedder=HashEmbedder(dim=8))


def test_nearest_training_captions_orders_by_cosine_distance():
    # hand-built geometry: candidate along e0; trained rows at known angles
    train = np.zeros((2, 2, 4), np.float32)
    train[0, 0] = [1, 0, 0, 0]       # identical         -> dist 0
    train[0, 1] = [1, 1, 0, 0]       # 45 degrees        -> dist 1-1/sqrt(2)
    train[1, 0] = [0, 1, 0, 0]       # orthogonal        -> dist 1
    train[1, 1] = [-1, 0, 0, 0]      # opposite          -> dist 2

    class E:
        dim = 4
        name = "fixed"

        def embed(self, sentences):
            return np.tile([1.0, 0, 0, 0], (len(sentences), 1))

    caps = [["t00", "t01"], ["t10", "t11"]]
    (res,) = nearest_training_captions(
        ["anything"], train, train_captions=caps, top_k=3, embedder=E())
    got = [(n["trial"], n["cid"]) for n in res["nearest"]]
    assert got == [(0, 0), (0, 1), (1, 0)]
    assert res["nearest"][0]["caption"] == "t00"
    assert res["farthest"]["trial"] == 1 and res["farthest"]["cid"] == 1
    np.testing.assert_allclose(res["nearest"][0]["distance"], 0.0, atol=1e-7)
    np.testing.assert_allclose(res["farthest"]["distance"], 2.0, atol=1e-7)
    # cross-check one mid-angle row against scipy's cosine distance
    scipy = pytest.importorskip("scipy.spatial.distance")
    want = scipy.cosine([1, 0, 0, 0], train[0, 1])
    np.testing.assert_allclose(res["nearest"][1]["distance"], want, atol=1e-7)


def test_nearest_handles_zero_vector_candidate():
    train = np.eye(3, dtype=np.float32).reshape(3, 1, 3)

    class Zero:
        dim = 3
        name = "zero"

        def embed(self, sentences):
            return np.zeros((len(sentences), 3), np.float32)

    (res,) = nearest_training_captions(["x"], train, embedder=Zero())
    assert all(np.isfinite(n["distance"]) for n in res["nearest"])


def _write_captions(tmp_path, caps_by_key):
    cap_dir = tmp_path / "captions"
    cap_dir.mkdir()
    for k, caps in caps_by_key.items():
        (cap_dir / f"KID{k}.txt").write_text("\n".join(caps) + "\n")
    return str(cap_dir)


def test_run_guse_precompute_writes_reference_layout(tmp_path):
    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.experiment import run_guse_precompute

    caps = {5: ["a red car", "one red car"], 9: ["a blue boat", "the boat"]}
    cap_dir = _write_captions(tmp_path, caps)
    cfg = Config(run="t", log=str(tmp_path / "log"))
    cfg.dataset.captions_path = cap_dir
    out = str(tmp_path / "guse")

    report = run_guse_precompute(cfg, out)
    table = np.load(os.path.join(out, "guse_pre_processed.npy"))
    keys = np.load(os.path.join(out, "keys.npy"))
    assert list(keys) == [5, 9]
    assert table.shape == (2, 2, 512)
    assert report["n_keys"] == 2 and report["captions_per_key"] == 2
    # hash fallback must label itself (never mistakable for real GUSE)
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["embedder"] == "hash" and meta["is_real_guse"] is False
    # per-key averaged vectors = mean over the caption axis (get_guse.py:94)
    for i, k in enumerate(keys):
        avg = np.load(os.path.join(
            out, "guse_averaged", f"guse_embedding_KID{int(k)}.npy"))
        np.testing.assert_allclose(avg, table[i].mean(axis=0), rtol=1e-6)


def test_run_guse_precompute_missing_captions_raises(tmp_path):
    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.experiment import run_guse_precompute

    cfg = Config(run="t", log=str(tmp_path / "log"))
    cfg.dataset.captions_path = str(tmp_path / "nope")
    with pytest.raises(FileNotFoundError):
        run_guse_precompute(cfg, str(tmp_path / "out"))


def test_cli_guse_and_analyze_nearest(tmp_path):
    """End-to-end: `mtt guse` precompute, then a fake run dir analyzed with
    --nearest-guse emits the per-candidate ranking tsv."""
    import yaml

    from masters_thesis_tpu.cli import main

    caps = {1: ["a red car drives", "one red car"],
            2: ["a blue boat sails", "the blue boat"]}
    cap_dir = _write_captions(tmp_path, caps)
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "run": "t", "log": str(tmp_path / "log"),
        "dataset": {"captions_path": cap_dir},
    }))
    out = tmp_path / "guse"
    assert main(["guse", "--config", str(cfg_path), "--out", str(out)]) == 0

    run = tmp_path / "run"
    run.mkdir()
    (run / "captions_3.txt").write_text("1\ta red car drives\n")
    (run / "config.yaml").write_text(cfg_path.read_text())
    assert main(["analyze", "--run", str(run),
                 "--nearest-guse", str(out)]) == 0
    tsv = run / "analysis" / "nearest_guse_3.tsv"
    lines = tsv.read_text().splitlines()
    assert lines[0].startswith("key\tcandidate\trank")
    # top-3 + farthest for the single candidate
    assert len(lines) == 1 + 4
    top = lines[1].split("\t")
    # the candidate IS a training caption (key 1, cid 0) -> distance ~0
    assert top[2] == "1" and float(top[3]) < 1e-4
    assert top[4] == "1" and top[6] == "a red car drives"


def test_nearest_guse_mismatched_caption_counts_drop_text(tmp_path):
    """A captions dir with a different captions-per-key count than the
    table's C axis must not mis-attribute (or crash on) caption text."""
    import yaml

    from masters_thesis_tpu.cli import main

    caps = {1: ["a red car", "one red car"], 2: ["a blue boat", "the boat"]}
    cap_dir = _write_captions(tmp_path, caps)
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "run": "t", "log": str(tmp_path / "log"),
        "dataset": {"captions_path": cap_dir},
    }))
    out = tmp_path / "guse"
    assert main(["guse", "--config", str(cfg_path), "--out", str(out)]) == 0

    # now shrink key 2's captions to ONE line (count mismatch vs C=2)
    (tmp_path / "captions" / "KID2.txt").write_text("a blue boat\n")
    run = tmp_path / "run"
    run.mkdir()
    (run / "captions_3.txt").write_text("1\ta red car\n")
    (run / "config.yaml").write_text(cfg_path.read_text())
    assert main(["analyze", "--run", str(run),
                 "--nearest-guse", str(out)]) == 0
    lines = (run / "analysis" / "nearest_guse_3.tsv").read_text().splitlines()
    # rows still written, caption column empty (alignment not trusted)
    assert len(lines) == 1 + 4
    assert all(ln.endswith("\t") for ln in lines[1:])


def test_nearest_ties_break_by_index_across_partition_boundary():
    """Duplicate captions embed identically -> exactly tied distances; the
    selection must keep the LOWEST indices (stable-argsort semantics), not
    an arbitrary argpartition subset straddling the top_k boundary."""
    import numpy as np

    from masters_thesis_tpu.evalsuite.guse_sim import (
        HashEmbedder,
        nearest_training_captions,
    )

    emb = HashEmbedder(dim=16)
    # 4 identical rows (trials 0..3, cid 0) then distinct fillers
    same = np.tile(np.asarray(emb.embed(["a red bird"]))[0], (4, 1))
    other = np.asarray(emb.embed(["totally different words here",
                                  "another unrelated caption row"]))
    table = np.concatenate([same, other], axis=0)[:, None, :]  # (6, 1, D)
    res = nearest_training_captions(
        ["a red bird"], table, top_k=3, embedder=emb)
    picked = [(e["trial"], e["cid"]) for e in res[0]["nearest"]]
    assert picked == [(0, 0), (1, 0), (2, 0)], picked


def test_guse_similarity_rejects_misaligned_lengths():
    import pytest

    from masters_thesis_tpu.evalsuite.guse_sim import (
        HashEmbedder,
        guse_similarity,
    )

    with pytest.raises(ValueError, match="align"):
        guse_similarity(["one caption"], [["r1"], ["r2"]],
                        embedder=HashEmbedder(dim=8))


def test_guse_precompute_output_trains_guse_nic(tmp_path):
    """The guse_nic chain end-to-end: mtt guse's guse_averaged/ per-key
    vectors are the betas_path a guse_nic config trains on (get_guse.py
    output feeding guse_NIC.py) — pin the real-data branch consumes them."""
    import numpy as np

    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.experiment import run_guse_precompute, run_training

    unique = list(range(1, 9))
    shared = [100, 101, 102]
    caps = {k: [f"a thing number {k}", f"another thing {k}",
                f"thing {k} again", f"thing {k} once more",
                f"the thing {k}"] for k in unique + shared}
    cap_dir = _write_captions(tmp_path, caps)

    nsd = tmp_path / "nsd"
    nsd.mkdir()
    lines = ["nsd_key,is_shared"]
    lines += [f"{k},0" for k in unique]
    lines += [f"{k},1" for k in shared]
    (nsd / "subj02_conditions.csv").write_text("\n".join(lines))
    (nsd / "test_conditions.csv").write_text("nsd_key\n100\n")
    # guse_nic has no encoder groups; atlases are still part of the layout
    np.save(nsd / "glasser_lh.npy", np.zeros(4, np.int64))
    np.save(nsd / "glasser_rh.npy", np.zeros(4, np.int64))

    cfg = Config(run="guse_chain", model="guse_nic", epochs=1, batch_size=4,
                 max_length=6, top_k=40, units=16, embedding_features=16,
                 log=str(tmp_path / "logs"))
    cfg.dataset.captions_path = cap_dir
    cfg.dataset.nsd_dir = str(nsd)

    out = str(tmp_path / "guse")
    run_guse_precompute(cfg, out)

    cfg.dataset.betas_path = os.path.join(out, "guse_averaged")
    run_path, logs, bundle = run_training(cfg, epochs=1)
    assert bundle["store"].row_shape == (512,)  # GUSE vector width
    assert np.isfinite(logs["loss"])
