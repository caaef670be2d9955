"""mtt export: serialized StableHLO decode artifacts (jax.export)."""

import json
import zipfile

import numpy as np
import pytest

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.experiment import run_training
from masters_thesis_tpu.export import (
    ARTIFACT_VERSION,
    ExportedCaptioner,
    export_run,
    load_exported,
)


@pytest.fixture()
def trained_run(shared_run):
    run_path, logs, bundle, _cfg = shared_run()  # session-scoped lc_nic run
    return run_path, bundle


def test_export_greedy_matches_live_decode(trained_run, tmp_path):
    from masters_thesis_tpu.serve import Captioner

    run_path, bundle = trained_run
    out = str(tmp_path / "greedy.mttx")
    meta = export_run(run_path, out, decoder="greedy", batch_size=4)
    assert meta["version"] == ARTIFACT_VERSION
    assert meta["input_width"] == bundle["store"].row_shape[0]

    exp = load_exported(out)
    betas = np.asarray(bundle["store"].data[:3], np.float32)
    live = Captioner.from_run_dir(run_path, batch_size=4)
    np.testing.assert_array_equal(
        exp.caption_ids(betas), live.caption_ids(betas))
    assert exp.caption(betas) == live.caption(betas)


def test_export_beam_matches_live_decode(trained_run, tmp_path):
    from masters_thesis_tpu.serve import Captioner

    run_path, bundle = trained_run
    out = str(tmp_path / "beam.mttx")
    meta = export_run(run_path, out, decoder="beam", batch_size=4,
                      beam_width=3)
    assert meta["beam_width"] == 3

    exp = load_exported(out)
    betas = np.asarray(bundle["store"].data[:2], np.float32)
    live = Captioner.from_run_dir(run_path, batch_size=4, beam_width=3)
    np.testing.assert_array_equal(
        exp.caption_ids(betas), live.caption_ids(betas, decoder="beam"))


def test_export_chunks_requests_past_batch_size(trained_run, tmp_path):
    run_path, bundle = trained_run
    out = str(tmp_path / "g.mttx")
    export_run(run_path, out, decoder="greedy", batch_size=4)
    exp = load_exported(out)
    data = np.asarray(bundle["store"].data, np.float32)
    betas = np.concatenate([data, data])[:9]  # 9 rows through batch 4
    ids = exp.caption_ids(betas)
    assert ids.shape[0] == 9
    # padding rows never leak: row i identical to a solo decode of row i
    np.testing.assert_array_equal(ids[8], exp.caption_ids(betas[8:9])[0])


def test_export_rejects_wrong_width(trained_run, tmp_path):
    run_path, _ = trained_run
    out = str(tmp_path / "g.mttx")
    export_run(run_path, out, decoder="greedy", batch_size=4)
    exp = load_exported(out)
    with pytest.raises(ValueError, match="expected"):
        exp.caption_ids(np.zeros((2, 7), np.float32))


def test_export_rejects_unknown_decoder(trained_run, tmp_path):
    run_path, _ = trained_run
    with pytest.raises(ValueError, match="decoder"):
        export_run(run_path, str(tmp_path / "s.mttx"), decoder="sample")


def test_load_rejects_future_version(trained_run, tmp_path):
    run_path, _ = trained_run
    out = str(tmp_path / "g.mttx")
    export_run(run_path, out, decoder="greedy", batch_size=4)
    tampered = str(tmp_path / "future.mttx")
    with zipfile.ZipFile(out) as src, zipfile.ZipFile(tampered, "w") as dst:
        for name in src.namelist():
            data = src.read(name)
            if name == "meta.json":
                meta = json.loads(data)
                meta["version"] = ARTIFACT_VERSION + 1
                data = json.dumps(meta).encode()
            dst.writestr(name, data)
    with pytest.raises(ValueError, match="version"):
        load_exported(tampered)


def test_http_serves_from_exported_artifact(trained_run, tmp_path):
    """mtt serve --export: the HTTP service runs from the artifact alone."""
    import io
    import json as _json
    import threading
    import urllib.request

    from masters_thesis_tpu.server import make_caption_server, serve_forever

    run_path, bundle = trained_run
    out = str(tmp_path / "g.mttx")
    export_run(run_path, out, decoder="greedy", batch_size=4)
    exp = load_exported(out)
    server = make_caption_server(exp, port=0, max_batch=8, max_wait_s=0.0,
                                 default_decoder=exp.meta["decoder"])
    host, port = server.server_address[:2]
    t = threading.Thread(target=serve_forever, args=(server,), daemon=True)
    t.start()
    try:
        betas = np.asarray(bundle["store"].data[:2], np.float32)
        body = _json.dumps({"betas": betas.tolist()}).encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/caption", data=body, method="POST",
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as resp:
            got = _json.loads(resp.read().decode())
        assert got["captions"] == exp.caption(betas)

        # overriding to a decoder the artifact doesn't freeze fails cleanly
        req = urllib.request.Request(
            f"http://{host}:{port}/caption?decoder=beam", data=body,
            method="POST", headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(req, timeout=30)
    finally:
        server.shutdown()


def test_export_ms2_freezes_one_subject_encoder(shared_run, tmp_path):
    """ms2 artifacts freeze ONE per-subject encoder (export --subject),
    matching eval/serving semantics — per-subject tokens must match the
    live per-subject Captioner."""
    from masters_thesis_tpu.serve import Captioner

    run_path, _, bundle, _cfg = shared_run(model="ms2_nic")
    betas = np.asarray(bundle["store"].data[:2], np.float32)
    ids = {}
    for subject in ("a", "b"):
        out = str(tmp_path / f"ms2_{subject}.mttx")
        meta = export_run(run_path, out, decoder="greedy", batch_size=4,
                          subject=subject)
        assert meta["subject"] == subject
        exp = load_exported(out)
        live = Captioner.from_run_dir(run_path, batch_size=4, subject=subject)
        ids[subject] = exp.caption_ids(betas)
        np.testing.assert_array_equal(ids[subject], live.caption_ids(betas))


def test_export_subject_rejected_for_single_encoder_runs(trained_run,
                                                         tmp_path):
    run_path, _ = trained_run
    with pytest.raises(ValueError, match="not an ms2_nic run"):
        export_run(run_path, str(tmp_path / "b.mttx"), subject="b")


def test_serve_cli_rejects_contradictory_decoder(trained_run, tmp_path):
    from masters_thesis_tpu.cli import main

    run_path, _ = trained_run
    out = str(tmp_path / "g.mttx")
    export_run(run_path, out, decoder="greedy", batch_size=4)
    with pytest.raises(SystemExit, match="freezes"):
        main(["serve", "--export", out, "--decoder", "beam", "--port", "0"])


def test_exported_empty_input_returns_empty_ids(trained_run, tmp_path):
    run_path, bundle = trained_run
    out = str(tmp_path / "g.mttx")
    export_run(run_path, out, decoder="greedy", batch_size=4)
    exp = load_exported(out)
    width = bundle["store"].row_shape[0]
    ids = exp.caption_ids(np.zeros((0, width), np.float32))
    assert ids.shape == (0, exp.meta["max_length"])


def test_export_showtell_run(shared_run, tmp_path):
    """Non-layout families export too: the artifact's input spec comes
    from the recorded trained row shape."""
    from masters_thesis_tpu.serve import Captioner

    run_path, _, bundle, cfg = shared_run(
        model="showtell", units=16, embedding_features=16)
    out = str(tmp_path / "st.mttx")
    meta = export_run(run_path, out, decoder="greedy", batch_size=4)
    width = bundle["store"].row_shape[0]
    assert meta["input_width"] == width and width != cfg.input_dim()
    exp = load_exported(out)
    betas = np.asarray(bundle["store"].data[:2], np.float32)
    live = Captioner.from_run_dir(run_path, batch_size=4)
    np.testing.assert_array_equal(
        exp.caption_ids(betas), live.caption_ids(betas))


def test_exported_decoder_guard_unit():
    exp = ExportedCaptioner(exported=None, tokenizer=None,
                            meta={"batch_size": 4, "input_width": 5,
                                  "decoder": "greedy"})
    with pytest.raises(ValueError, match="freezes"):
        exp.caption_ids(np.zeros((1, 5), np.float32), decoder="beam")


def test_exported_captioner_padding_unit():
    """Padding/chunking logic without a real program (fast tier)."""
    class FakeExported:
        def call(self, chunk):
            assert chunk.shape == (4, 5)  # always the static shape
            return np.asarray(chunk[:, :2], np.int32)

    meta = {"batch_size": 4, "input_width": 5, "max_length": 2,
            "decoder": "greedy"}
    exp = ExportedCaptioner(FakeExported(), tokenizer=None, meta=meta)
    x = np.arange(7 * 5, dtype=np.float32).reshape(7, 5)
    ids = exp.caption_ids(x)
    assert ids.shape == (7, 2)
    np.testing.assert_array_equal(ids, x[:, :2].astype(np.int32))


def test_export_pre_bakes_transform_chain(tmp_path):
    """export --pre: the preprocess chain (vc mask -> normalize -> pca) is
    baked into the StableHLO program — the artifact takes RAW rows and its
    tokens match host-side chain replay + live decode exactly."""
    from masters_thesis_tpu.experiment import (
        apply_preprocess_chain,
        run_preprocess,
    )
    from masters_thesis_tpu.serve import Captioner

    # raw per-key betas + atlases + split (mirrors the real-data fixtures)
    nsd = tmp_path / "nsd"
    caps = tmp_path / "caps"
    raw = tmp_path / "raw"
    for d in (nsd, caps, raw):
        d.mkdir()
    rng = np.random.default_rng(5)
    keys = list(range(1, 13))
    for k in keys:
        np.save(raw / f"subj02_KID{k}.npy",
                rng.standard_normal(64).astype(np.float32))
        (caps / f"KID{k}.txt").write_text("\n".join(
            " ".join(rng.choice("a the dog cat runs sits".split(), size=5))
            for _ in range(5)))
    np.save(nsd / "glasser_lh.npy", np.repeat([0, 1, 2], [24, 4, 4]))
    np.save(nsd / "glasser_rh.npy", np.repeat([0, 1], [26, 6]))
    (nsd / "subj02_conditions.csv").write_text("\n".join(
        ["nsd_key,is_shared"] + [f"{k},0" for k in keys[:9]]
        + [f"{k},1" for k in keys[9:]]))
    (nsd / "test_conditions.csv").write_text("nsd_key\n12\n")

    cfg = Config(run="exp_pre", model="thinkandtell", epochs=1, batch_size=4,
                 max_length=6, top_k=40, units=16, embedding_features=16,
                 log=str(tmp_path / "logs"))
    cfg.dataset.betas_path = str(raw)
    cfg.dataset.captions_path = str(caps)
    cfg.dataset.nsd_dir = str(nsd)
    pre = tmp_path / "pre"
    report = run_preprocess(cfg, str(pre), vc_parcels="1,2", normalize=True,
                            pca_components=4)
    cfg.dataset.betas_path = report["pca"]["pack"]
    run_path, _, bundle = run_training(cfg, epochs=1)

    out = str(tmp_path / "pre.mttx")
    meta = export_run(run_path, out, decoder="greedy", batch_size=4,
                      pre=str(pre))
    assert meta["pre_stages"] == ["vc_mask", "normalize", "pca"]
    assert meta["input_width"] == 64  # the RAW width, not the reduced 4

    exp = load_exported(out)
    raw_rows = rng.standard_normal((3, 64)).astype(np.float32)
    live = Captioner.from_run_dir(run_path, batch_size=4)
    expect = live.caption_ids(apply_preprocess_chain(str(pre), raw_rows))
    np.testing.assert_array_equal(exp.caption_ids(raw_rows), expect)
