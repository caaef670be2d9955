import numpy as np

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
