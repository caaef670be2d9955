"""Fused recurrent train kernel: forward + hand-derived backward parity
against a pure-JAX reference of the same chain (interpret mode, CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masters_thesis_tpu.ops.fused_rnn import fused_rnn

B, R, RP, A, D, E, U, T = 5, 6, 8, 4, 3, 7, 8, 4


def ref_rnn(pre, feat, emb, w2, b2, v, bv, wx, wh, b,
            n_regions=R, units=U, max_length=T):
    h = jnp.zeros((pre.shape[0], units))
    c = jnp.zeros_like(h)
    rid = jax.lax.broadcasted_iota(jnp.int32, pre.shape[:2], 1)
    hs, als = [], []
    for t in range(max_length):
        s = jnp.tanh(pre + (h @ w2 + b2)[:, None, :])
        e = jnp.sum(s * v[None, None, :], -1) + bv
        alpha = jax.nn.softmax(jnp.where(rid < n_regions, e, -1e30), axis=1)
        ctx = jnp.sum(alpha[:, :, None] * feat, axis=1)
        z = jnp.concatenate([ctx, emb[:, t]], -1) @ wx + h @ wh + b
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        hs.append(h)
        als.append(alpha)
    return jnp.stack(hs, 1), jnp.stack(als, 1)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    mk = lambda *shape: jnp.asarray(
        rng.standard_normal(shape) * 0.5, jnp.float32)
    pre = mk(B, RP, A)
    # padded region rows get arbitrary values — the mask must neutralise them
    feat = mk(B, RP, D)
    return dict(
        pre=pre, feat=feat, emb=mk(B, T, E),
        w2=mk(U, A), b2=mk(A), v=mk(A), bv=jnp.asarray(0.3, jnp.float32),
        wx=mk(D + E, 4 * U), wh=mk(U, 4 * U), b=mk(4 * U),
    )


ORDER = ("pre", "feat", "emb", "w2", "b2", "v", "bv", "wx", "wh", "b")


def _args(inputs):
    return tuple(inputs[k] for k in ORDER)


def test_forward_matches_reference(inputs):
    hseq, alphas = fused_rnn(*_args(inputs), R, U, T, 8)
    hseq_r, alphas_r = ref_rnn(*_args(inputs))
    np.testing.assert_allclose(np.asarray(hseq), np.asarray(hseq_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(alphas), np.asarray(alphas_r),
                               rtol=1e-5, atol=1e-6)
    # padded regions carry exactly zero attention
    assert float(np.abs(np.asarray(alphas)[:, :, R:]).max()) == 0.0


def test_gradients_match_reference(inputs):
    rng = np.random.default_rng(1)
    r1 = jnp.asarray(rng.standard_normal((B, T, U)), jnp.float32)
    r2 = jnp.asarray(rng.standard_normal((B, T, RP)), jnp.float32)

    def loss_fused(*args):
        hseq, alphas = fused_rnn(*args, R, U, T, 8)
        return jnp.sum(hseq * r1) + jnp.sum(alphas * r2)

    def loss_ref(*args):
        hseq, alphas = ref_rnn(*args)
        return jnp.sum(hseq * r1) + jnp.sum(alphas * r2)

    gf = jax.grad(loss_fused, argnums=tuple(range(10)))(*_args(inputs))
    gr = jax.grad(loss_ref, argnums=tuple(range(10)))(*_args(inputs))
    for name, a, b in zip(ORDER, gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"grad mismatch for {name}")


def test_gradients_match_with_uneven_tiles(inputs):
    # B=5 with batch_tile=2 -> ragged last tile exercises tile masking
    def loss(*args):
        hseq, alphas = fused_rnn(*args, R, U, T, 2)
        return jnp.sum(hseq ** 2) + jnp.sum(alphas ** 2)

    def loss_ref(*args):
        hseq, alphas = ref_rnn(*args)
        return jnp.sum(hseq ** 2) + jnp.sum(alphas ** 2)

    gf = jax.grad(loss, argnums=(3, 7))(*_args(inputs))     # w2, wx
    gr = jax.grad(loss_ref, argnums=(3, 7))(*_args(inputs))
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
