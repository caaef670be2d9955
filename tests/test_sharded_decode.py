"""Greedy decode under a device mesh: batch-sharded inputs, GSPMD-propagated
program — validates the eval path scales like the train path."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.synthetic import synthetic_dataset
from masters_thesis_tpu.decode.greedy import make_greedy_decoder
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.parallel.mesh import make_mesh
from masters_thesis_tpu.train.state import init_model


def test_greedy_decode_with_sharded_batch():
    cfg = Config(top_k=40, batch_size=8, max_length=6, units=16, attn_units=8,
                 group_size=4, embedding_text=8)
    split, pairs, tok, store, groups = synthetic_dataset(
        n_keys=16, n_voxels=128, n_groups=4, top_k=cfg.top_k
    )
    layout = GroupLayout(groups, 128)
    model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
                  embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
                  vocab_size=cfg.vocab_size, max_length=cfg.max_length)
    betas = store.gather_host(np.arange(8, dtype=np.int32))
    tokens = np.zeros((8, cfg.max_length), np.int32)
    params, bstats, _ = init_model(model, cfg, betas, tokens)
    variables = {"params": params, "batch_stats": bstats}

    dec = make_greedy_decoder(model, cfg.units, cfg.max_length)
    w_ref, _, _ = dec(variables, jnp.asarray(betas), tok.start_id)

    mesh = make_mesh(data=4, model=2)
    sharded = jax.device_put(
        jnp.asarray(betas), NamedSharding(mesh, P("data", "model"))
    )
    w_sh, _, _ = dec(variables, sharded, tok.start_id)
    np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w_sh))
