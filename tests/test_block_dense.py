"""LocallyDense layout tests (the Pallas block-dense kernel was removed in
round 2: measured no end-to-end win over XLA's own einsum fusion)."""

import jax
import jax.numpy as jnp
import numpy as np


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
