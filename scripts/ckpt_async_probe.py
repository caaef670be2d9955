"""Async checkpoint timing at flagship state size: how long save() blocks
(host staging) vs the deferred commit (_finalize_pending), i.e. how much
checkpoint wall-time the next epoch's training now overlaps."""
import sys, os, time, shutil
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from types import SimpleNamespace
import numpy as np
from masters_thesis_tpu.train.checkpoint import CheckpointManager


class S(SimpleNamespace):
    def replace(self, **kw):
        d = vars(self).copy(); d.update(kw); return S(**d)


rng = np.random.default_rng(0)
# flagship LcNIC: ~10.5M encoder + embedding/LSTM/head params, fp32,
# with Adam m/v mirrors -> ~3x
params = {
    "encoder": {f"bucket_{i}": {"kernel": rng.standard_normal(
        (45, 1024, 32)).astype(np.float32)} for i in range(8)},
    "lstm": {"wx": rng.standard_normal((800, 2048)).astype(np.float32),
             "wh": rng.standard_normal((512, 2048)).astype(np.float32)},
    "embedding": rng.standard_normal((5001, 512)).astype(np.float32),
    "head": {"w1": rng.standard_normal((512, 256)).astype(np.float32),
             "wo": rng.standard_normal((256, 5001)).astype(np.float32)},
}
opt = {"m": {k: np.copy(v) if isinstance(v, np.ndarray) else
             {k2: {k3: np.copy(v3) for k3, v3 in v2.items()}
              if isinstance(v2, dict) else np.copy(v2)
              for k2, v2 in v.items()}
        for k, v in params.items()}}
import jax
nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves((params, opt)))
print(f"state size: {nbytes/1e6:.0f} MB")

d = "/tmp/ckpt_probe"; shutil.rmtree(d, ignore_errors=True)
mgr = CheckpointManager(d, max_to_keep=2)
state = S(params=params, batch_stats={}, opt_state=opt,
          step=np.int32(1), rng=np.zeros((2,), np.uint32))
for epoch in range(3):
    t0 = time.perf_counter()
    mgr.save(state, epoch, val_loss=1.0)
    t_stage = time.perf_counter() - t0
    t0 = time.perf_counter()
    mgr.close()
    t_commit = time.perf_counter() - t0
    print(f"epoch {epoch}: save() blocked {t_stage*1e3:7.1f} ms, "
          f"deferred commit {t_commit*1e3:7.1f} ms", flush=True)
shutil.rmtree(d, ignore_errors=True)
