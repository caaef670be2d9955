"""The complete user journey through the CLI, one stage feeding the next:

    raw session files -> mtt preprocess --from-sessions -> pack
    -> mtt train -> mtt metrics --resume (decode + score)
    -> mtt analyze -> mtt export -> artifact serving

Each stage is covered in isolation elsewhere; this pins the CROSS-STAGE
contracts (ingest output feeds the pack, the pack feeds the real-data
training branch, the run dir feeds eval/analyze/export) the way a
reference user would actually chain them (MIGRATION.md's workflow).
"""

import json

import numpy as np
import pytest

from masters_thesis_tpu.cli import main


def _write_sessions(root, n_voxels=96):
    """NSD-shaped raw data: per-session lh/rh betas + behavior rows +
    caption corpus. 20 unique keys (1..20) + 6 shared (100..105, each
    presented twice for repeat-averaging); 3 shared keys form the test set."""
    rng = np.random.default_rng(3)
    sessions = root / "sessions"
    sessions.mkdir()
    unique = list(range(1, 21))
    shared = list(range(100, 106))
    # session 1: unique 1..16; session 2: unique 17..20 + shared x2 (repeats)
    schedule = [unique[:16], unique[16:] + shared + shared]
    behav = ["SUBJECT,SESSION,RUN,TRIAL,73KID"]
    for s, kids in enumerate(schedule, start=1):
        T = len(kids)
        lh = rng.standard_normal((n_voxels // 2, T))
        rh = rng.standard_normal((n_voxels // 2, T))
        np.save(sessions / f"lh.betas_session{s:02d}.npy", lh)
        np.save(sessions / f"rh.betas_session{s:02d}.npy", rh)
        for t, kid in enumerate(kids):
            behav.append(f"2,{s},1,{t + 1},{kid}")
    behav_csv = root / "behavior.csv"
    behav_csv.write_text("\n".join(behav) + "\n")

    words = "a the dog cat runs sits park red blue green".split()
    caps = {
        str(k): [" ".join(rng.choice(words, size=5)) + "." for _ in range(5)]
        for k in unique + shared
    }
    caps_json = root / "captions.json"
    caps_json.write_text(json.dumps(caps))

    nsd = root / "nsd"
    nsd.mkdir()
    lines = ["nsd_key,is_shared"]
    lines += [f"{k},0" for k in unique]
    lines += [f"{k},1" for k in shared]
    (nsd / "subj02_conditions.csv").write_text("\n".join(lines))
    (nsd / "test_conditions.csv").write_text(
        "\n".join(["nsd_key"] + [str(k) for k in shared[:3]])
    )
    half = n_voxels // 2
    np.save(nsd / "glasser_lh.npy", np.repeat([0, 1, 2], [half - 8, 4, 4]))
    np.save(nsd / "glasser_rh.npy", np.repeat([0, 1], [half - 6, 6]))
    return sessions, behav_csv, caps_json, nsd


def _last_json(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_sessions_to_artifact_full_journey(tmp_path, capsys):
    from masters_thesis_tpu.config import Config

    sessions, behav_csv, caps_json, nsd = _write_sessions(tmp_path)

    # ---- stage 1: offline preprocessing from raw session files ----
    cfg = Config(run="journey", model="lc_nic", epochs=2, batch_size=8,
                 max_length=8, top_k=60, units=16, attn_units=8, group_size=4,
                 embedding_text=16, log=str(tmp_path / "logs"))
    cfg_path = tmp_path / "cfg.yaml"
    cfg.save(cfg_path)
    pre_out = tmp_path / "pre"
    assert main(["preprocess", "--config", str(cfg_path),
                 "--out", str(pre_out),
                 "--from-sessions", str(sessions),
                 "--behavior", str(behav_csv),
                 "--captions-json", str(caps_json),
                 "--n-sessions", "2"]) == 0
    pre = _last_json(capsys)
    assert pre["pack"]["n_rows"] == 26  # 20 unique + 6 repeat-averaged
    # repeats averaged: the pack has ONE row per key even for 2x-presented
    from masters_thesis_tpu.data.pack import open_pack

    store = open_pack(str(pre_out / "betas_pack"))
    assert sorted(store.keys.tolist()) == list(range(1, 21)) + list(
        range(100, 106))

    # ---- stage 2: training on the preprocessed data (real-data branch) ----
    import glob as _glob
    import os

    hits = _glob.glob(str(pre_out / "ingest" / "**" / "*KID100.txt"),
                      recursive=True)
    assert hits, "ingest produced no caption files"
    ingest_caps = os.path.dirname(hits[0])
    cfg.dataset.betas_path = str(pre_out / "betas_pack")
    cfg.dataset.captions_path = ingest_caps
    cfg.dataset.nsd_dir = str(nsd)
    cfg.save(cfg_path)
    assert main(["train", "--config", str(cfg_path), "--epochs", "2"]) == 0
    out = _last_json(capsys)
    run_path = out["run_path"]
    assert out["loss"] > 0 and "val_loss" in out

    # ---- stage 3: restore + decode + score without retraining ----
    assert main(["metrics", "--config", str(cfg_path), "--resume",
                 "--epochs", "0"]) == 0
    scores = _last_json(capsys)
    # 3 test keys x 5 captions: the eval set enumerates (key, caption) pairs
    assert scores["n_captions"] == 15
    assert "Bleu_4" in scores and "CIDEr" in scores
    # artifacts carry the restored epoch's suffix (eval.py's {e} naming)
    assert _glob.glob(os.path.join(run_path, "output_captions_*.npy"))
    assert _glob.glob(os.path.join(run_path, "attention_scores_*.npy"))

    # ---- stage 4: post-hoc analysis on the finished run ----
    assert main(["analyze", "--run", run_path]) == 0
    analysis = _last_json(capsys)
    art_dir = analysis.get("out", run_path)
    assert any(f.startswith("region") or f.endswith(".png")
               for f in os.listdir(art_dir))

    # ---- stage 5: export and serve from the artifact ----
    artifact = str(tmp_path / "journey.mttx")
    assert main(["export", "--run", run_path, "--out", artifact,
                 "--batch-size", "4"]) == 0
    meta = _last_json(capsys)
    assert meta["input_width"] == 96

    from masters_thesis_tpu.export import load_exported
    from masters_thesis_tpu.serve import Captioner

    exp = load_exported(artifact)
    betas = np.asarray(store.data[:3], np.float32)
    live = Captioner.from_run_dir(run_path, batch_size=4)
    assert exp.caption(betas) == live.caption(betas)
    assert all(isinstance(t, str) for t in exp.caption(betas))
