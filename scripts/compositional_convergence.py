"""Round-5 non-saturating convergence benchmark (VERDICT r4 item 4).

Trains the attention flagship (configs/flagship_comp.yaml) and the
no-attention ShowTell baseline (configs/showtell_comp.yaml) through the
production ``run_training`` path on IDENTICAL compositional structured
synthetic data (same seed => same keys/factors/betas; val/test keys use
UNSEEN factor combinations — data/synthetic.py::synthetic_factors). The
decoded val BLEU/CIDEr curves should (a) plateau below the 1.0 ceiling and
(b) rank the flagship above the baseline — making the benchmark a real
model discriminator rather than a solved task.

Writes artifacts/compositional_convergence.json with both curves +
run_meta throughput. Smoke: MTT_COMP_SMOKE=1 runs 4 epochs at tiny dims.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E402,E702
import json
import time

from masters_thesis_tpu.config import load_config
from masters_thesis_tpu.experiment import run_training

SMOKE = os.environ.get("MTT_COMP_SMOKE", "") not in ("", "0")
SMOKE_KEYS = int(os.environ.get("MTT_COMP_KEYS", "2571"))

out = {}
for name in ("flagship_comp", "showtell_comp"):
    cfg = load_config(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", f"{name}.yaml"))
    epochs = cfg.epochs
    if SMOKE:
        epochs = 4
        cfg.caption_metrics_every = 2
        cfg.tpu.scan_steps = 4
    t0 = time.perf_counter()
    run_path, logs, bundle = run_training(
        cfg, epochs=epochs, smoke_keys=(48 if SMOKE else SMOKE_KEYS))
    wall = time.perf_counter() - t0
    meta = json.load(open(os.path.join(run_path, "run_meta.json")))
    curve = meta.get("caption_metrics", [])
    out[name] = {
        "run_path": run_path,
        "wall_s": round(wall, 1),
        "steps_per_sec_median": meta.get("steps_per_sec_median"),
        "final_val_loss": logs.get("val_loss"),
        "caption_metrics": curve,
    }
    last = curve[-1] if curve else {}
    print(f"{name}: {len(curve)} metric points, last={last}", flush=True)

os.makedirs("artifacts", exist_ok=True)
with open("artifacts/compositional_convergence.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({k: v["caption_metrics"][-1] if v["caption_metrics"]
                  else None for k, v in out.items()}, indent=1))
