import numpy as np

import pytest
from masters_thesis_tpu.evalsuite.analysis import (
    attention_by_region,
    caption_table,
    hit_rate,
    loss_curves,
    perplexity,
)


def test_perplexity_uniform():
    V = 10
    logits = np.zeros((2, 4, V))
    ids = np.ones((2, 4), np.int64)
    p = perplexity(logits, ids)
    np.testing.assert_allclose(p, V, rtol=1e-6)
    # padding ignored
    ids2 = ids.copy()
    ids2[:, 2:] = 0
    np.testing.assert_allclose(perplexity(logits, ids2), V, rtol=1e-6)


def test_caption_table_sorted_by_bleu():
    cands = ["a dog runs", "completely wrong words"]
    refs = [["a dog runs fast"], ["a cat sits"]]
    rows = caption_table(cands, refs, keys=[5, 9])
    assert rows[0]["caption"] == "a dog runs"
    assert rows[0]["bleu1"] > rows[1]["bleu1"]
    assert rows[0]["key"] == 5


def test_hit_rate():
    a = {1: "a dog in the park", 2: "red car"}
    b = {1: "the dog runs", 2: "blue bicycle", 3: "unshared"}
    out = hit_rate(a, b, n=1)
    assert out["n_shared"] == 2
    assert out["hit_rate"] == 0.5  # key 1 shares 'dog'/'the', key 2 nothing
    assert 0 < out["mean_jaccard"] < 1


def test_attention_by_region_ranking():
    attn = np.zeros((2, 3, 4))
    attn[..., 2] = 1.0
    out = attention_by_region(attn, region_names=list("abcd"), top_k=2)
    assert out["ranking"][0]["region"] == "c"
    np.testing.assert_allclose(out["mean"][2], 1.0)


def test_loss_curves(tmp_path):
    p = tmp_path / "loss_history.csv"
    p.write_text("epoch,loss,val_loss\n0,2.0,2.5\n1,1.5,2.0\n")
    c = loss_curves(str(p))
    np.testing.assert_allclose(c["loss"], [2.0, 1.5])
    np.testing.assert_allclose(c["epoch"], [0, 1])


def test_attention_tsne_shapes():
    import numpy as np

    from masters_thesis_tpu.evalsuite.analysis import attention_tsne

    rng = np.random.default_rng(0)
    attn = rng.random((12, 5, 30)).astype(np.float32)
    coords = attention_tsne(attn, perplexity=5.0)
    assert coords.shape == (12, 2)
    assert np.isfinite(coords).all()


def test_plot_region_attention_writes_png(tmp_path):
    import numpy as np

    from masters_thesis_tpu.evalsuite.analysis import (
        attention_tsne,
        plot_region_attention,
        plot_tsne,
    )

    vals = np.random.default_rng(0).random(360)
    out = tmp_path / "attn.png"
    plot_region_attention(vals, str(out))
    assert out.stat().st_size > 1000
    coords = attention_tsne(np.random.default_rng(1).random((10, 360)),
                            perplexity=3.0)
    out2 = tmp_path / "tsne.png"
    plot_tsne(coords, str(out2), labels=np.arange(10) % 2)
    assert out2.stat().st_size > 1000


def test_attention_to_vertices_projection():
    """The compare_attention.py projection: group values fill their vertex
    indices, everything else stays NaN."""
    from masters_thesis_tpu.evalsuite.analysis import attention_to_vertices

    groups = [np.array([0, 2]), np.array([5]), np.array([1, 3, 4])]
    out = attention_to_vertices(np.array([0.5, 0.9, 0.1]), groups, 8)
    assert out.shape == (8,)
    np.testing.assert_allclose(out[[0, 2]], 0.5)
    assert out[5] == np.float32(0.9)
    np.testing.assert_allclose(out[[1, 3, 4]], np.float32(0.1))
    assert np.isnan(out[6]) and np.isnan(out[7])

    with pytest.raises(AssertionError, match="attention regions"):
        attention_to_vertices(np.zeros(2), groups, 8)


def test_plot_vertex_attention_writes_png(tmp_path):
    from masters_thesis_tpu.evalsuite.analysis import plot_vertex_attention

    vals = np.random.default_rng(0).random(40).astype(np.float32)
    vals[3] = np.nan
    raster = tmp_path / "raster.png"
    plot_vertex_attention(vals, str(raster), n_lh=20)
    assert raster.stat().st_size > 0

    coords = {
        "lh": np.random.default_rng(1).random((20, 2)),
        "rh": np.random.default_rng(2).random((20, 2)),
    }
    flat = tmp_path / "flat.png"
    plot_vertex_attention(vals, str(flat), n_lh=20, coords=coords)
    assert flat.stat().st_size > 0


def test_caption_grid_entries_sorted_best_and_worst(tmp_path):
    from masters_thesis_tpu.evalsuite.analysis import (
        caption_grid_entries,
        plot_caption_grid,
    )

    keys = [1, 2, 3, 4]
    texts = ["a dog runs", "a cat sits", "total nonsense words here",
             "a bird flies"]
    refs = {1: ["a dog runs"], 2: ["a cat sits"],
            3: ["a man rides a horse"], 4: ["a bird flies"]}
    calls = []

    def loader(key):
        calls.append(key)
        return np.full((4, 4, 3), 10 * key, np.uint8)

    entries = caption_grid_entries(keys, texts, image_loader=loader,
                                   references=refs, n=2)
    # n=2 -> best 1 + worst 1; perfect match first, nonsense last
    assert len(entries) == 2
    assert "BLEU-4" in entries[0][2]
    assert entries[1][0].shape == (4, 4, 3)
    assert "ref:" in entries[0][2]
    # loader called only for selected rows
    assert len(calls) == 2
    out = tmp_path / "grid.png"
    plot_caption_grid(entries, str(out))
    assert out.stat().st_size > 1000

    # no references: first n in order, no subtitle
    plain = caption_grid_entries(keys, texts, n=3)
    assert [e[1].split(":")[0] for e in plain] == ["1", "2", "3"]
    assert plain[0][2] is None and plain[0][0] is None


def test_attention_over_time_means_and_tops():
    from masters_thesis_tpu.evalsuite.analysis import attention_over_time

    attn = np.zeros((5, 3, 8), np.float32)
    attn[:, 0, 2] = 1.0   # step 0 attends region 2
    attn[:, 1, 5] = 0.5   # step 1 attends region 5
    attn[:, 2, 0] = 0.25
    out = attention_over_time(attn, top_k=2)
    assert out["per_step"].shape == (3, 8)
    assert out["top_regions"][0][0]["index"] == 2
    assert out["top_regions"][0][0]["mean_attention"] == 1.0
    assert out["top_regions"][1][0]["index"] == 5


def test_attention_by_tag_deviation():
    from masters_thesis_tpu.evalsuite.analysis import attention_by_tag

    # caption 0: "a dog riding" -> det, noun, verb (participle lexicon);
    # caption 1: "red dog <end>" -> adjective, noun, special
    caps = ["a dog riding", "red dog <end>"]
    attn = np.zeros((2, 3, 4), np.float32)
    attn[0, 1, 0] = 1.0   # 'dog' (noun) attends region 0
    attn[1, 1, 0] = 1.0   # 'dog' (noun) again
    attn[0, 2, 3] = 1.0   # 'riding' (verb) attends region 3
    out = attention_by_tag(caps, attn)
    noun = out["tags"]["noun"]
    assert noun["n_words"] == 2
    np.testing.assert_allclose(noun["mean"], [1.0, 0, 0, 0])
    # deviation subtracts the overall (all steps incl specials) mean
    np.testing.assert_allclose(
        noun["deviation"], noun["mean"] - out["overall_mean"])
    verb = out["tags"]["verb"]
    assert verb["n_words"] == 1 and verb["mean"][3] == 1.0
    # <end> contributes to no tag
    adj = out["tags"]["adjective"]
    assert adj["n_words"] == 1   # 'red'


def test_pos_tag_word_matches_caption_stats_lexicons():
    from masters_thesis_tpu.evalsuite.analysis import pos_tag_word

    assert pos_tag_word("a") == "determiner"
    assert pos_tag_word("on") == "preposition"
    assert pos_tag_word("running") in ("verb", "noun")  # lexicon-dependent
    assert pos_tag_word("dog") == "noun"


def test_analyze_temporal_attention_artifacts(tmp_path):
    import contextlib
    import io
    import json

    from masters_thesis_tpu.cli import main

    run = tmp_path / "run"
    run.mkdir()
    attn = np.random.default_rng(0).random((4, 3, 360)).astype(np.float32)
    np.save(run / "attention_scores_2.npy", attn)
    (run / "captions_2.txt").write_text(
        "1\ta dog runs\n2\tthe red cat\n3\ta man walks\n4\tblue boat sails\n")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["analyze", "--run", str(run),
                     "--word-map", "1"]) == 0
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    names = {a.rsplit("/", 1)[-1] for a in report["artifacts"]}
    assert {"attention_over_time_2.png", "attention_by_tag_2.png",
            "attention_word_map_2_1.png"} <= names
    tops = report["top_region_per_step_2"]
    assert len(tops) == 3 and tops[0]["region"].startswith(("LH_", "RH_"))


def test_caption_table_cleans_refs_and_zeroes_empty():
    # raw COCO case/punctuation must not deflate scores; empty ref lists
    # must score 0.0 (method1 smoothing gave them a spurious floor)
    rows = caption_table(
        ["a cat on a mat", "some words here"],
        [["A cat on a mat."], []],
        keys=[1, 2],
    )
    by_key = {r["key"]: r for r in rows}
    assert by_key[1]["bleu1"] == 1.0
    assert by_key[2]["bleu1"] == 0.0


def test_caption_grid_entries_cleans_references(tmp_path):
    from masters_thesis_tpu.evalsuite.analysis import caption_grid_entries

    entries = caption_grid_entries(
        [7], ["a cat on a mat"], references={7: ["A cat on a mat."]}, n=2)
    assert entries[0][2].startswith("BLEU-4 1.000"), entries[0][2]


def test_most_active_vertices_ranking_and_overlap():
    from masters_thesis_tpu.evalsuite.analysis import most_active_vertices

    rng = np.random.default_rng(0)
    n, v = 40, 64
    base = rng.normal(size=v).astype(np.float32)
    # vertices 0..9 are 10x louder in both splits; splits share structure
    base[:10] += 10.0
    a = base + 0.1 * rng.normal(size=(n, v)).astype(np.float32)
    b = base + 0.1 * rng.normal(size=(n, v)).astype(np.float32)
    out = most_active_vertices(a, b, top_n=10, chunk=7)
    assert set(out["indices"].tolist()) == set(range(10))
    assert out["overlap"] == 10 and out["overlap_fraction"] == 1.0
    # reference semantics: argsort of mean |betas|, top-N
    ref = np.argsort(np.abs(a).mean(axis=0))[-10:]
    assert set(out["indices"].tolist()) == set(ref.tolist())
    # descending activity order
    ma = out["mean_abs"][out["indices"]]
    assert (np.diff(ma) <= 1e-6).all()


def test_betas_semantic_similarity_detects_structure():
    from masters_thesis_tpu.evalsuite.analysis import (
        betas_semantic_similarity,
    )

    rng = np.random.default_rng(1)
    n, v, d = 60, 32, 8
    # latent semantic factor drives BOTH the embedding and the betas:
    # semantically-similar trials must sit closer in betas space
    z = rng.normal(size=(n, d)).astype(np.float32)
    proj_g = rng.normal(size=(d, 16)).astype(np.float32)
    proj_b = rng.normal(size=(d, v)).astype(np.float32)
    guse = z @ proj_g
    betas = z @ proj_b + 0.05 * rng.normal(size=(n, v)).astype(np.float32)
    out = betas_semantic_similarity(betas, guse, targets=[3, 17],
                                    n_similar=8, n_random=20, seed=4)
    assert out["mse_ratio"] < 1.0  # similar trials closer than random
    assert out["spearman_sem_vs_negmse"] > 0.3
    assert len(out["targets"]) == 2
    t0 = out["targets"][0]
    assert t0["most_similar"] != 3 and -1.0 <= t0["max_cosine"] <= 1.0
    # (N, C, 512)-style caption tables average over C
    out3 = betas_semantic_similarity(
        betas, np.stack([guse, guse], axis=1), targets=[3, 17],
        n_similar=8, n_random=20, seed=4)
    assert np.isclose(out3["mse_ratio"], out["mse_ratio"])


def test_spearman_rank_correlation():
    from masters_thesis_tpu.evalsuite.analysis import _spearman

    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    assert _spearman(x, 2 * x + 1) == 1.0
    assert _spearman(x, -x) == -1.0
    # ties get averaged ranks (monotone but tied data stays +1-ish, not nan)
    assert _spearman(np.array([1.0, 1.0, 2.0, 2.0]),
                     np.array([1.0, 1.0, 2.0, 2.0])) == 1.0


def test_analyze_betas_flags(tmp_path):
    import contextlib
    import io
    import json

    from masters_thesis_tpu.cli import main

    run = tmp_path / "run"
    run.mkdir()
    rng = np.random.default_rng(2)
    betas = rng.normal(size=(30, 40)).astype(np.float32)
    guse = rng.normal(size=(30, 12)).astype(np.float32)
    np.save(tmp_path / "betas.npy", betas)
    np.save(tmp_path / "betas_b.npy", betas + 0.01)
    np.save(tmp_path / "guse.npy", guse)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["analyze", "--run", str(run),
                     "--betas", str(tmp_path / "betas.npy"),
                     "--betas-b", str(tmp_path / "betas_b.npy"),
                     "--top-verts", "8",
                     "--guse", str(tmp_path / "guse.npy"),
                     "--sim-targets", "0,5"]) == 0
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    names = {a.rsplit("/", 1)[-1] for a in report["artifacts"]}
    assert {"most_active_vert.txt", "betas_guse_similarity.png"} <= names
    assert report["most_active_vertices"]["top_n"] == 8
    assert report["most_active_vertices"]["overlap"] >= 7  # near-identical b
    sim = report["betas_guse_similarity"]
    assert {p["target"] for p in sim["targets"]} == {0, 5}
    txt = [p for p in report["artifacts"]
           if p.endswith("most_active_vert.txt")][0]
    assert len(open(txt).read().split()) == 8


def test_most_active_vertices_ties_break_lowest_index_first():
    from masters_thesis_tpu.evalsuite.analysis import most_active_vertices

    # vertices 3 and 8 tie exactly; both beat the rest
    betas = np.zeros((4, 12), np.float32)
    betas[:, 3] = 2.0
    betas[:, 8] = 2.0
    betas[:, 5] = 1.0
    out = most_active_vertices(betas, top_n=3)
    assert out["indices"].tolist() == [3, 8, 5]


def test_betas_semantic_similarity_excludes_target_from_similar_pool():
    from masters_thesis_tpu.evalsuite.analysis import (
        betas_semantic_similarity,
    )

    rng = np.random.default_rng(0)
    n, v = 6, 16
    betas = rng.normal(size=(n, v)).astype(np.float32)
    guse = rng.normal(size=(n, 8)).astype(np.float32)
    # n_similar far above n: the -inf-cosine target must NOT re-enter the
    # tail of the similar pool as a degenerate MSE-0 point
    out = betas_semantic_similarity(betas, guse, targets=[2],
                                    n_similar=100, n_random=10, seed=1)
    t = out["targets"][0]
    assert len(t["mse_similar"]) == n - 1
    assert (t["mse_similar"] > 0).all()


def test_betas_analyses_work_from_memmap(tmp_path):
    from masters_thesis_tpu.evalsuite.analysis import (
        betas_semantic_similarity,
        streamed_betas_stats,
    )

    rng = np.random.default_rng(3)
    arr = rng.normal(size=(25, 40)).astype(np.float32)
    path = tmp_path / "betas.npy"
    np.save(path, arr)
    mm = np.load(path, mmap_mode="r")
    stats = streamed_betas_stats(mm, chunk=7)
    np.testing.assert_allclose(stats["mean"], arr.mean(axis=0), atol=1e-5)
    np.testing.assert_allclose(stats["l1norm"], np.abs(arr).sum(axis=0),
                               rtol=1e-5)
    guse = rng.normal(size=(25, 8)).astype(np.float32)
    out_mm = betas_semantic_similarity(mm, guse, targets=[4],
                                       n_similar=5, n_random=5, seed=0)
    out_ram = betas_semantic_similarity(arr, guse, targets=[4],
                                        n_similar=5, n_random=5, seed=0)
    assert np.isclose(out_mm["mse_ratio"], out_ram["mse_ratio"])
