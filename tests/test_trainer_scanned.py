import numpy as np

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.pairs import encode_pairs
from masters_thesis_tpu.data.pipeline import BatchPipeline
from masters_thesis_tpu.data.synthetic import synthetic_dataset
from masters_thesis_tpu.models.nic import LcNIC
from masters_thesis_tpu.ops.group_layout import GroupLayout
from masters_thesis_tpu.train.loop import Trainer
from masters_thesis_tpu.train.losses import lc_nic_l2_rules
from masters_thesis_tpu.train.optim import make_optimizer
from masters_thesis_tpu.train.state import TrainState, init_model
from masters_thesis_tpu.train.steps import (
    make_eval_step,
    make_scanned_train_steps,
    make_train_step,
)


def test_trainer_with_scanned_steps():
    cfg = Config(top_k=30, batch_size=4, max_length=5, units=12, attn_units=6,
                 group_size=4, embedding_text=8, epochs=1)
    cfg.tpu.scan_steps = 3
    split, pairs, tok, store, groups = synthetic_dataset(
        n_keys=16, n_voxels=64, n_groups=3, top_k=cfg.top_k,
        device_resident=True,
    )
    layout = GroupLayout(groups, 64)
    model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
                  embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
                  vocab_size=cfg.vocab_size, max_length=cfg.max_length)
    enc = encode_pairs(pairs["train"], tok, cfg.max_length)
    pipe = BatchPipeline(enc, store, cfg.batch_size, seed=0, prefetch=0)
    batch = next(iter(pipe.epoch()))
    betas0 = np.asarray(store.device_array())[batch["idx"]]
    params, bstats, rng = init_model(model, cfg, betas0, batch["tokens"])
    tx = make_optimizer(cfg)
    state = TrainState.create(params=params, batch_stats=bstats, tx=tx, rng=rng)
    rules = lc_nic_l2_rules(cfg)

    from masters_thesis_tpu.train.callbacks import Callback

    class CountBatches(Callback):
        steps: list = []

        def on_batch_end(self, trainer, step, logs):
            self.steps.append(step)
            assert np.isfinite(float(logs["loss"]))

    counter = CountBatches()
    counter.steps = []
    trainer = Trainer(
        cfg,
        make_train_step(model, cfg, rules, donate=False),
        make_eval_step(model, cfg, rules),
        state,
        pipe,
        callbacks=[counter],
        store=store,
    )
    trainer.use_scanned_steps(make_scanned_train_steps(model, cfg, rules))
    logs = trainer.fit(epochs=1)
    assert np.isfinite(logs["loss"])
    # 20 batches per epoch (80 pairs / bs 4), all consumed
    assert int(trainer.state.step) == len(pipe)
    # every step fired a batch callback IN ORDER — including the ragged tail
    # (20 = 6 chunks of 3 + 2 tail steps) — without reading state.step
    assert counter.steps == list(range(1, len(pipe) + 1))
    assert trainer._host_step == int(trainer.state.step)


def test_run_training_activates_scanned_mode(tmp_path):
    """cfg.tpu.scan_steps > 1 moves the store into device memory (honoring
    store_dtype) and trains through the multi-step path end to end."""
    import numpy as np

    from masters_thesis_tpu.experiment import run_eval, run_training

    cfg = Config(run="scanwire", top_k=40, batch_size=8, max_length=6,
                 units=16, attn_units=8, group_size=4, embedding_text=8,
                 epochs=1, log=str(tmp_path) + "/")
    cfg.tpu.scan_steps = 4
    cfg.tpu.store_dtype = "bfloat16"
    run_path, logs, bundle = run_training(cfg, epochs=1, smoke_keys=24)
    assert np.isfinite(logs["loss"])
    assert bundle["store"].device_resident
    assert str(bundle["store"].device_array().dtype) == "bfloat16"
    out = run_eval(bundle, run_path)
    assert len(out["texts"]) > 0


def _build_scanned_fixture(scan_steps):
    cfg = Config(top_k=30, batch_size=4, max_length=5, units=12, attn_units=6,
                 group_size=4, embedding_text=8, epochs=1)
    cfg.tpu.scan_steps = scan_steps
    split, pairs, tok, store, groups = synthetic_dataset(
        n_keys=16, n_voxels=64, n_groups=3, top_k=cfg.top_k,
        device_resident=True,
    )
    layout = GroupLayout(groups, 64)
    model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
                  embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
                  vocab_size=cfg.vocab_size, max_length=cfg.max_length)
    enc = encode_pairs(pairs["train"], tok, cfg.max_length)
    pipe = BatchPipeline(enc, store, cfg.batch_size, seed=0, prefetch=0)
    batch = next(iter(pipe.epoch()))
    betas0 = np.asarray(store.device_array())[batch["idx"]]
    params, bstats, rng = init_model(model, cfg, betas0, batch["tokens"])
    tx = make_optimizer(cfg)
    state = TrainState.create(params=params, batch_stats=bstats, tx=tx, rng=rng)
    rules = lc_nic_l2_rules(cfg)
    from masters_thesis_tpu.train.callbacks import Callback

    class Recorder(Callback):
        def __init__(self):
            self.steps = []
            self.interrupted = False

        def on_batch_end(self, trainer, step, logs):
            self.steps.append(step)
            assert np.isfinite(float(logs["loss"]))

        def on_interrupt(self, trainer, epoch):
            self.interrupted = True

    rec = Recorder()
    trainer = Trainer(
        cfg,
        make_train_step(model, cfg, rules, donate=False),
        make_eval_step(model, cfg, rules),
        state,
        pipe,
        callbacks=[rec],
        store=store,
    )
    return cfg, model, rules, pipe, trainer, rec


def test_scan_steps_one_runs_scanned_path():
    """scan_steps=1 engages the scanned/device-store path as documented
    (the activation sites used `> 1`, silently dropping to the per-step
    host path for K=1)."""
    cfg, model, rules, pipe, trainer, rec = _build_scanned_fixture(1)
    trainer.use_scanned_steps(make_scanned_train_steps(model, cfg, rules))
    logs = trainer.fit(epochs=1)
    assert np.isfinite(logs["loss"])
    assert int(trainer.state.step) == len(pipe)
    assert rec.steps == list(range(1, len(pipe) + 1))


def test_scanned_interrupt_delivers_pending_metrics():
    """Preemption mid-epoch must not discard completed chunks' batch rows:
    the deferred delivery runs before the partial-save path fires."""
    cfg, model, rules, pipe, trainer, rec = _build_scanned_fixture(3)
    real = make_scanned_train_steps(model, cfg, rules)
    calls = {"n": 0}

    def wrapped(state, data, idx, tok, tgt):
        calls["n"] += 1
        out = real(state, data, idx, tok, tgt)
        if calls["n"] == 2:
            trainer._preempted = True  # simulated SIGTERM between batches
        return out

    trainer.use_scanned_steps(wrapped)
    trainer.fit(epochs=1)
    assert rec.interrupted
    # two completed chunks of 3 steps each: all 6 rows delivered, in order
    assert rec.steps == list(range(1, 7))


def test_scanned_validation_matches_per_batch():
    """The one-call scanned validation pass returns the same mean metrics as
    the per-batch eval loop."""
    from masters_thesis_tpu.train.steps import (
        make_scanned_eval_steps_from_tables,
    )

    cfg = Config(top_k=30, batch_size=4, max_length=5, units=12, attn_units=6,
                 group_size=4, embedding_text=8, epochs=1)
    cfg.tpu.scan_steps = 3
    split, pairs, tok, store, groups = synthetic_dataset(
        n_keys=16, n_voxels=64, n_groups=3, top_k=cfg.top_k,
        device_resident=True,
    )
    layout = GroupLayout(groups, 64)
    model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
                  embedding_text=cfg.embedding_text, attn_units=cfg.attn_units,
                  vocab_size=cfg.vocab_size, max_length=cfg.max_length)
    enc = encode_pairs(pairs["train"], tok, cfg.max_length)
    val_enc = encode_pairs(pairs["val"], tok, cfg.max_length)
    pipe = BatchPipeline(enc, store, cfg.batch_size, seed=0, prefetch=0)
    vpipe = BatchPipeline(val_enc, store, cfg.batch_size, seed=0,
                          shuffle=False, prefetch=0)
    assert vpipe.steps_per_epoch > 1
    batch = next(iter(pipe.epoch()))
    betas0 = np.asarray(store.device_array())[batch["idx"]]
    params, bstats, rng = init_model(model, cfg, betas0, batch["tokens"])
    tx = make_optimizer(cfg)
    state = TrainState.create(params=params, batch_stats=bstats, tx=tx,
                              rng=rng)
    rules = lc_nic_l2_rules(cfg)
    trainer = Trainer(
        cfg,
        make_train_step(model, cfg, rules, donate=False),
        make_eval_step(model, cfg, rules),
        state,
        pipe,
        val_pipe=vpipe,
        store=store,
    )
    loop_logs = trainer._run_validation()
    trainer.use_scanned_eval(
        make_scanned_eval_steps_from_tables(model, cfg, rules))
    scan_logs = trainer._run_validation()
    assert set(scan_logs) == set(loop_logs)
    for k in loop_logs:
        np.testing.assert_allclose(scan_logs[k], loop_logs[k], rtol=1e-5,
                                   atol=1e-7, err_msg=k)
