"""Decompose the integrated-trainer vs bench steps/s gap (round 5, VERDICT
r4 weak 5 / item 7).

The 100-epoch convergence run logged ~260 steps/s median vs bench's ~320 —
attributed to callbacks/checkpoint/caption-metrics by inference, not
measurement. This probe measures it: the SAME flagship-scale run_training
(structured synthetic, scan_steps=140, rbg) with features toggled one at a
time, reporting the median per-epoch train-phase steps/s and the epoch
wall time each feature adds:

  bare          ckpt only at the final epoch, no caption metrics (epochs
                chosen so the every-5 preview/grad callbacks never fire)
  +ckpt         per-epoch async orbax checkpointing (ckpt_every=1)
  +capmetrics   per-epoch decoded val BLEU/CIDEr (caption_metrics_every=1)

Writes artifacts/trainer_overhead.json; the CONFIG.md ckpt_every /
caption_metrics_every guidance cites these numbers.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E402,E702
import json
import time

import numpy as np

from masters_thesis_tpu.config import Config, DatasetConfig, TPUConfig
from masters_thesis_tpu.experiment import run_training

SMOKE_KEYS = int(os.environ.get("MTT_OVH_KEYS", "2571"))
EPOCHS = 4  # every-5 previews/grad-stats never fire; epoch 0 carries compile


def variant(name, **kw):
    cfg = Config(
        run=f"ovh_{name}", log="/tmp/mtt_overhead/",
        epochs=EPOCHS, batch_size=64, max_length=15, top_k=5000,
        units=512, attn_units=32, group_size=32, embedding_text=512,
        seed=42,
        caption_metrics_every=kw.get("caption_metrics_every", 0),
        dataset=DatasetConfig(synthetic="structured"),
        tpu=TPUConfig(scan_steps=140, use_pallas=True, prng_impl="rbg",
                      ckpt_every=kw.get("ckpt_every", EPOCHS + 1)),
    )
    t0 = time.perf_counter()
    run_path, logs, bundle = run_training(cfg, smoke_keys=SMOKE_KEYS)
    wall = time.perf_counter() - t0
    rows = [json.loads(l) for l in open(os.path.join(run_path,
                                                     "metrics.jsonl"))]
    ep = [r for r in rows if r.get("kind") == "epoch"]
    # epoch 0 pays the compile; report steady-state medians over the rest
    sps = [r["steps_per_sec"] for r in ep[1:]]
    et = [r["epoch_time"] for r in ep[1:]]
    # logs["epoch_time"] closes BEFORE the epoch-end callbacks run, so the
    # checkpoint-save / caption-metric cost lives only in the wall time
    # BETWEEN epoch records (metrics.jsonl ts deltas) — the quantity this
    # probe exists to measure; deltas past the first exclude compiles
    deltas = np.diff([r["ts"] for r in ep])[1:]
    out = {
        "steps_per_sec_median": round(float(np.median(sps)), 1),
        "epoch_time_median_s": round(float(np.median(et)), 2),
        "epoch_wall_incl_callbacks_median_s": round(
            float(np.median(deltas)), 2) if len(deltas) else None,
        "total_wall_s": round(wall, 1),
        "epochs": EPOCHS,
    }
    print(f"{name:12s}: {out}", flush=True)
    return out


results = {}
results["bare"] = variant("bare")
results["ckpt_every_1"] = variant("ckpt", ckpt_every=1)
results["capmetrics_every_1"] = variant("capm", caption_metrics_every=1)

b = results["bare"]["epoch_wall_incl_callbacks_median_s"]
for k in ("ckpt_every_1", "capmetrics_every_1"):
    results[k]["epoch_cost_vs_bare_s"] = round(
        results[k]["epoch_wall_incl_callbacks_median_s"] - b, 2)

os.makedirs("artifacts", exist_ok=True)
with open("artifacts/trainer_overhead.json", "w") as f:
    json.dump({"smoke_keys": SMOKE_KEYS, "results": results}, f, indent=1)
print(json.dumps(results, indent=1))
