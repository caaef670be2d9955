"""Cross-checks against the exact libraries the reference used where they are
available offline: NLTK (sentence BLEU, evaluate.py/cython kernel) and
sklearn (PCA, SVD/svd.py)."""

import numpy as np
import pytest

nltk = pytest.importorskip("nltk")
sklearn = pytest.importorskip("sklearn")

from nltk.translate.bleu_score import SmoothingFunction, sentence_bleu as nltk_bleu
from sklearn.decomposition import PCA as SkPCA

from masters_thesis_tpu.data.preprocess.pca import fit_pca
from masters_thesis_tpu.evalsuite.bleu import sentence_bleu


CASES = [
    (["the cat sat on the mat".split(), "a cat on the mat".split()],
     "the cat is on the mat".split()),
    (["a man rides a horse".split()], "a man rides a red horse".split()),
    (["one two three four five six".split()], "one two three".split()),
    (["a b c d".split()], "a b c d".split()),
]


@pytest.mark.parametrize("refs,hyp", CASES)
def test_sentence_bleu_matches_nltk_raw(refs, hyp):
    ours = sentence_bleu(refs, hyp, weights=(0.25,) * 4, smoothing="none")
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        theirs = nltk_bleu(refs, hyp, weights=(0.25, 0.25, 0.25, 0.25))
    assert ours == pytest.approx(theirs, abs=1e-9)


@pytest.mark.parametrize("refs,hyp", CASES)
def test_sentence_bleu_matches_nltk_method2(refs, hyp):
    ours = sentence_bleu(refs, hyp, weights=(0.25,) * 4, smoothing="method2")
    theirs = nltk_bleu(
        refs, hyp, weights=(0.25,) * 4,
        smoothing_function=SmoothingFunction().method2,
    )
    assert ours == pytest.approx(theirs, abs=1e-9)


@pytest.mark.parametrize("weights", [(1, 0, 0, 0), (0.5, 0.5, 0, 0)])
def test_sentence_bleu_weight_sets_match_nltk(weights):
    refs, hyp = CASES[0]
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        theirs = nltk_bleu(refs, hyp, weights=weights)
    ours = sentence_bleu(refs, hyp, weights=weights, smoothing="none")
    assert ours == pytest.approx(theirs, abs=1e-9)


def test_pca_matches_sklearn_subspace():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((200, 30)).astype(np.float32)
    x[:, :5] *= 10  # give it structure
    ours = fit_pca(x, n_components=5, use_jax=False, n_iter=7, seed=0)
    sk = SkPCA(n_components=5, svd_solver="randomized", random_state=0).fit(x)
    # compare subspaces (components defined up to sign/rotation)
    p_ours = ours.components.T @ ours.components
    p_sk = sk.components_.T @ sk.components_
    np.testing.assert_allclose(p_ours, p_sk, atol=1e-2)
    np.testing.assert_allclose(
        np.sort(ours.explained_variance_),
        np.sort(sk.explained_variance_),
        rtol=1e-2,
    ) if hasattr(ours, "explained_variance_") else None
    np.testing.assert_allclose(
        np.sort(ours.explained_variance),
        np.sort(sk.explained_variance_),
        rtol=1e-2,
    )
