import numpy as np
from jax.sharding import PartitionSpec as P

from masters_thesis_tpu.parallel.sharding import param_pspec


class _Leaf:
    def __init__(self, shape):
        self.shape = shape


def test_encoder_kernels_shard_voxel_axis():
    spec = param_pspec(["encoder", "kernel_0"], _Leaf((10, 256, 32)), 2)
    assert spec == P(None, "model", None)
    # non-divisible padded axis -> replicated
    spec = param_pspec(["encoder", "kernel_0"], _Leaf((10, 255, 32)), 2)
    assert spec == P()


def test_embedding_and_head_shard_vocab():
    assert param_pspec(["embedding"], _Leaf((5000, 512)), 4) == P("model", None)
    assert param_pspec(["embedding"], _Leaf((5001, 512)), 4) == P()
    assert param_pspec(["dense_out", "kernel"], _Leaf((256, 5120)), 4) == P(
        None, "model"
    )


def test_small_params_replicated():
    assert param_pspec(["lstm", "kernel"], _Leaf((544, 2048)), 4) == P()
    assert param_pspec(["attention", "W1", "kernel"], _Leaf((32, 32)), 4) == P()


def test_resume_from_checkpoint(tmp_path):
    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.experiment import run_training

    cfg = Config(run="resume_t", model="lc_nic", epochs=2, batch_size=4,
                 max_length=6, top_k=40, units=16, attn_units=8, group_size=4,
                 embedding_text=8, log=str(tmp_path))
    run_path, logs, bundle = run_training(cfg, epochs=1, smoke_keys=12)
    assert bundle["manager"].latest_epoch() == 0
    # resume continues at epoch 1 with the restored step counter
    run_path2, logs2, bundle2 = run_training(
        cfg, epochs=2, smoke_keys=12, resume=True
    )
    assert bundle2["manager"].latest_epoch() == 1
    assert int(bundle2["state"].step) > int(bundle["state"].step)
