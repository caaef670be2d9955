"""PCA / randomized-SVD dimensionality reduction of betas.

Reference (ThinkAndTell/SVD/svd.py:64-93): sklearn PCA(n_components=5000,
svd_solver='randomized') fit on the unique-trial split, then applied to all
splits. Rebuilt here on jax.numpy so the (27k x 62k) factorisation runs on
the accelerator (Halko et al. randomized range finder), with a numpy
fallback path for hosts.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class PCAModel:
    mean: np.ndarray          # (V,)
    components: np.ndarray    # (k, V)
    explained_variance: np.ndarray  # (k,)

    def transform(self, x: np.ndarray) -> np.ndarray:
        return (np.asarray(x) - self.mean) @ self.components.T

    def inverse_transform(self, z: np.ndarray) -> np.ndarray:
        return np.asarray(z) @ self.components + self.mean

    def save(self, path: str) -> None:
        np.savez(
            path, mean=self.mean, components=self.components,
            explained_variance=self.explained_variance,
        )

    @classmethod
    def load(cls, path: str) -> "PCAModel":
        z = np.load(path)
        return cls(z["mean"], z["components"], z["explained_variance"])


def fit_pca(
    x: np.ndarray,
    n_components: int,
    n_oversample: int = 10,
    n_iter: int = 4,
    seed: int = 0,
    use_jax: bool = True,
) -> PCAModel:
    """Randomized PCA (Halko): range-find with power iterations, then SVD of
    the projected matrix."""
    x = np.asarray(x, np.float32)
    n, v = x.shape
    k = min(n_components, n, v)
    mean = x.mean(axis=0)

    if use_jax:
        try:
            return _fit_jax(x, mean, k, n_oversample, n_iter, seed)
        except Exception as e:  # pragma: no cover - fall through to numpy
            import logging

            # the host factorization of a (27k, 62k) matrix takes HOURS —
            # say why the accelerator path was abandoned
            logging.getLogger(__name__).warning(
                "jax PCA path failed (%s: %s); falling back to numpy",
                type(e).__name__, e)
    return _fit_numpy(x, mean, k, n_oversample, n_iter, seed)


def _fit_numpy(x, mean, k, p, n_iter, seed) -> PCAModel:
    rng = np.random.default_rng(seed)
    xc = x - mean
    n, v = xc.shape
    q = rng.standard_normal((v, min(k + p, n))).astype(np.float32)
    y = xc @ q
    for _ in range(n_iter):
        y, _ = np.linalg.qr(y)
        y = xc @ (xc.T @ y)
    qy, _ = np.linalg.qr(y)
    b = qy.T @ xc                      # (k+p, V)
    _, s, vt = np.linalg.svd(b, full_matrices=False)
    comps = vt[:k]
    ev = (s[:k] ** 2) / max(n - 1, 1)
    return PCAModel(mean, comps.astype(np.float32), ev.astype(np.float32))


def _fit_jax(x, mean, k, p, n_iter, seed) -> PCAModel:
    import jax
    import jax.numpy as jnp

    xc = jnp.asarray(x) - jnp.asarray(mean)
    n, v = xc.shape
    key = jax.random.PRNGKey(seed)
    q = jax.random.normal(key, (v, min(k + p, n)), jnp.float32)
    y = xc @ q
    for _ in range(n_iter):
        y, _ = jnp.linalg.qr(y)
        y = xc @ (xc.T @ y)
    qy, _ = jnp.linalg.qr(y)
    b = qy.T @ xc
    _, s, vt = jnp.linalg.svd(b, full_matrices=False)
    comps = np.asarray(vt[:k], np.float32)
    ev = np.asarray((s[:k] ** 2) / max(n - 1, 1), np.float32)
    return PCAModel(mean, comps, ev)
