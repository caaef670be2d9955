import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_dataset
from masters_thesis_tpu.decode.greedy import make_greedy_decoder
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.fused_step import make_fused_greedy_decoder
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.train.state import init_model


@pytest.fixture(scope="module")
def setup():
    cfg = Config(top_k=40, batch_size=8, max_length=6, units=16,
                 attn_units=8, group_size=4, embedding_text=16)
    split, pairs, tok, store, groups = synthetic_dataset(
        n_keys=8, n_voxels=128, n_groups=5, top_k=cfg.top_k
    )
    layout = GroupLayout(groups, n_voxels=128)
    model = LcNIC(
        layout=layout, units=cfg.units, group_size=cfg.group_size,
        embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
        vocab_size=cfg.vocab_size, max_length=cfg.max_length,
    )
    betas = store.gather_host(np.arange(8, dtype=np.int32))
    tokens = np.zeros((8, cfg.max_length), np.int32)
    params, batch_stats, _ = init_model(model, cfg, betas, tokens)
    variables = {"params": params, "batch_stats": batch_stats}
    return cfg, model, variables, jnp.asarray(betas), tok


def test_fused_greedy_matches_reference_decoder(setup):
    cfg, model, variables, betas, tok = setup
    ref = make_greedy_decoder(model, cfg.units, cfg.max_length)
    fused = make_fused_greedy_decoder(model, cfg.units, cfg.max_length)
    w1, l1, a1 = ref(variables, betas, tok.start_id)
    w2, l2, a2 = fused(variables, betas, tok.start_id)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=2e-4,
                               atol=2e-5)
    # attention still sums to one over the true regions
    np.testing.assert_allclose(np.asarray(a2.sum(-1)), 1.0, rtol=1e-4)
