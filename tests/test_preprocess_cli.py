import json

import numpy as np

from masters_thesis_tpu.cli import main
from masters_thesis_tpu.config import Config


def test_preprocess_cli(tmp_path, capsys):
    betas = tmp_path / "betas"
    caps = tmp_path / "caps"
    betas.mkdir()
    caps.mkdir()
    rng = np.random.default_rng(0)
    for k in range(1, 9):
        np.save(betas / f"subj02_KID{k}.npy",
                rng.standard_normal(32).astype(np.float32))
        (caps / f"KID{k}.txt").write_text("a dog runs.\nthe dog sits.\n")

    cfg = Config(top_k=20)
    cfg.dataset.betas_path = str(betas)
    cfg.dataset.captions_path = str(caps)
    cfg_path = tmp_path / "c.yaml"
    cfg.save(cfg_path)

    out_dir = tmp_path / "out"
    assert main(["preprocess", "--config", str(cfg_path), "--out",
                 str(out_dir), "--pca", "4"]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["pack"]["n_rows"] == 8
    assert report["voxel_stats"]["n_voxels"] == 32
    assert report["pca"]["components"] == 4
    assert report["tokenizer"]["n_captions"] == 16
    assert (out_dir / "betas_pack" / "data.bin").exists()
    assert (out_dir / "tokenizer.json").exists()
    assert (out_dir / "pca_model.npz").exists()

    # the pack feeds training via the real-data path
    from masters_thesis_tpu.data.pack import open_pack

    store = open_pack(str(out_dir / "betas_pack"))
    assert len(store) == 8
