import jax
import jax.numpy as jnp
import numpy as np

from masters_thesis_tpu.models.common import leaky_relu
from masters_thesis_tpu.ops.block_dense import block_dense_leaky


def _ref(xg, w, bias, slope=0.2):
    y = jnp.einsum("bgp,gpd->bgd", xg, w) + bias
    return leaky_relu(y, slope)


def test_block_dense_matches_einsum():
    rng = np.random.default_rng(0)
    B, G, P, D = 8, 3, 128, 32
    xg = jnp.asarray(rng.standard_normal((B, G, P)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((G, P, D)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((G, D)), jnp.float32)
    out = block_dense_leaky(xg, w, b)
    np.testing.assert_allclose(out, _ref(xg, w, b), rtol=1e-4, atol=1e-4)


def test_block_dense_grad_matches():
    rng = np.random.default_rng(1)
    B, G, P, D = 4, 2, 128, 32
    xg = jnp.asarray(rng.standard_normal((B, G, P)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((G, P, D)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((G, D)), jnp.float32)

    def loss_pallas(xg, w, b):
        return (block_dense_leaky(xg, w, b) ** 2).sum()

    def loss_ref(xg, w, b):
        return (_ref(xg, w, b) ** 2).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(xg, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(xg, w, b)
    for a, r in zip(gp, gr):
        np.testing.assert_allclose(a, r, rtol=1e-3, atol=1e-3)


def test_pregathered_locally_dense_matches_gathered():
    from masters_thesis_tpu.data.synthetic import synthetic_groups
    from masters_thesis_tpu.models.locally_dense import LocallyDense
    from masters_thesis_tpu.ops.group_layout import GroupLayout

    rng = np.random.default_rng(2)
    groups = synthetic_groups(300, 5, seed=3)
    layout = GroupLayout(groups, 300)
    x = rng.standard_normal((4, 300)).astype(np.float32)

    m1 = LocallyDense(layout=layout, out_dim=8, dropout=0.0, use_bn=False)
    v = m1.init(jax.random.PRNGKey(0), jnp.asarray(x), training=False)
    out1 = m1.apply(v, jnp.asarray(x), training=False)

    xg = layout.permute_rows(x)
    assert xg.shape == (4, layout.padded_total)
    m2 = LocallyDense(layout=layout, out_dim=8, dropout=0.0, use_bn=False,
                      pregathered=True)
    out2 = m2.apply(v, jnp.asarray(xg), training=False)
    np.testing.assert_allclose(out1, out2, rtol=1e-5, atol=1e-5)


def test_pallas_locally_dense_matches():
    from masters_thesis_tpu.data.synthetic import synthetic_groups
    from masters_thesis_tpu.models.locally_dense import LocallyDense
    from masters_thesis_tpu.ops.group_layout import GroupLayout

    rng = np.random.default_rng(4)
    groups = synthetic_groups(256, 3, seed=5)
    layout = GroupLayout(groups, 256)
    x = rng.standard_normal((4, 256)).astype(np.float32)
    m1 = LocallyDense(layout=layout, out_dim=8, dropout=0.0, use_bn=False)
    v = m1.init(jax.random.PRNGKey(0), jnp.asarray(x), training=False)
    out1 = m1.apply(v, jnp.asarray(x), training=False)
    m2 = LocallyDense(layout=layout, out_dim=8, dropout=0.0, use_bn=False,
                      use_pallas=True)
    out2 = m2.apply(v, jnp.asarray(x), training=False)
    np.testing.assert_allclose(out1, out2, rtol=1e-4, atol=1e-4)
