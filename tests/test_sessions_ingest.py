"""Session-level ingestion (my_get_betas, nsd_get_data.py:174-281): synthetic
multi-session fixture proving per-session z-score + repeat-average equals the
reference recipe end-to-end (sessions -> per-trial npy -> averaged pack)."""

import json

import numpy as np
import pytest

from masters_thesis_tpu.cli import main
from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.preprocess.sessions import (
    averaged_rows,
    ingest_sessions,
    read_behavior,
)

V = 12  # 6 vertices per hemisphere


def _write_fixture(tmp_path, n_sessions=2, trials_per_session=4, subject=2):
    """Two sessions; KIDs repeat across sessions (NSD shared-image repeats)."""
    rng = np.random.default_rng(7)
    sessions_dir = tmp_path / "sessions"
    sessions_dir.mkdir()
    # KID schedule: session 1 -> 11,12,13,11 ; session 2 -> 12,14,11,15
    kid_schedule = [[11, 12, 13, 11], [12, 14, 11, 15]][:n_sessions]
    behav_lines = ["SUBJECT,SESSION,RUN,TRIAL,73KID"]
    raw = {}
    for s in range(1, n_sessions + 1):
        lh = rng.standard_normal((V // 2, trials_per_session))
        rh = rng.standard_normal((V // 2, trials_per_session))
        np.save(sessions_dir / f"lh.betas_session{s:02d}.npy", lh)
        np.save(sessions_dir / f"rh.betas_session{s:02d}.npy", rh)
        raw[s] = np.vstack([lh, rh])  # (V, T) — reference layout
        for t, kid in enumerate(kid_schedule[s - 1]):
            behav_lines.append(f"{subject},{s},1,{t + 1},{kid}")
    behav = tmp_path / "behavior.csv"
    behav.write_text("\n".join(behav_lines) + "\n")
    caps = {str(k): [f"a photo of thing {k}.", f"another view of {k}."]
            for k in {11, 12, 13, 14, 15}}
    caps_json = tmp_path / "captions.json"
    caps_json.write_text(json.dumps(caps))
    return sessions_dir, behav, caps_json, raw, kid_schedule


def _reference_recipe(raw, kid_schedule):
    """The nsd_get_data math, written independently: z-score each session's
    (V, T) across trials (axis=1), then average trials sharing a KID
    (first-appearance order)."""
    per_trial = []  # (kid, vec) in trial order
    for s, kids in zip(sorted(raw), kid_schedule):
        arr = raw[s]
        z = (arr - arr.mean(axis=1, keepdims=True)) / arr.std(
            axis=1, keepdims=True)
        for t, kid in enumerate(kids):
            per_trial.append((kid, z[:, t]))
    order, sums, counts = [], {}, {}
    for kid, vec in per_trial:
        if kid not in sums:
            order.append(kid)
            sums[kid] = vec.astype(np.float64)
            counts[kid] = 1
        else:
            sums[kid] += vec
            counts[kid] += 1
    return {k: (sums[k] / counts[k]).astype(np.float32) for k in order}, order


def test_ingest_writes_reference_contract(tmp_path):
    sessions_dir, behav, caps_json, raw, schedule = _write_fixture(tmp_path)
    out = tmp_path / "ingested"
    report = ingest_sessions(str(sessions_dir), str(behav), str(out),
                             n_sessions=5, captions_json=str(caps_json))
    # sessions 3..5 absent -> skipped like the reference's valid_trials guard
    assert report["sessions"] == 2 and report["skipped"] == [3, 4, 5]
    assert report["trials"] == 8
    betas_dir = out / "subj_2" / "betas"
    # reference file-name contract
    assert (betas_dir / "betas_SUB2_S1_R1_T1_KID11.npy").exists()
    assert (betas_dir / "betas_SUB2_S2_R1_T4_KID15.npy").exists()
    # per-trial content = session z-score of that trial's column
    arr = raw[1]
    z = (arr - arr.mean(axis=1, keepdims=True)) / arr.std(axis=1, keepdims=True)
    got = np.load(betas_dir / "betas_SUB2_S1_R1_T2_KID12.npy")
    np.testing.assert_allclose(got, z[:, 1].astype(np.float32), rtol=1e-6)
    # caption files carry the Flickr8k-style path#i\tcaption lines
    cap = (out / "subj_2" / "captions" / "SUB2_KID11.txt").read_text()
    lines = cap.strip().splitlines()
    assert len(lines) == 2 and "#0\t" in lines[0] and "#1\t" in lines[1]
    assert lines[0].endswith("a photo of thing 11.")


def test_repeat_average_matches_reference_recipe(tmp_path):
    sessions_dir, behav, caps_json, raw, schedule = _write_fixture(tmp_path)
    out = tmp_path / "ingested"
    ingest_sessions(str(sessions_dir), str(behav), str(out), n_sessions=2)
    want, order = _reference_recipe(raw, schedule)
    got = dict(averaged_rows(str(out / "subj_2" / "betas")))
    assert set(got) == set(want)
    for kid in want:
        np.testing.assert_allclose(got[kid], want[kid], rtol=1e-5, atol=1e-6)
    # KID11 repeats 3x across both sessions — averaged, not duplicated
    assert len(got) == 5


def test_averaged_rows_kid_in_ancestor_dir(tmp_path):
    """A directory component named KID<digits> must not shadow the per-file
    keys (the regex matches basenames only)."""
    betas = tmp_path / "KID2024" / "betas"
    betas.mkdir(parents=True)
    np.save(betas / "betas_SUB2_S1_R1_T1_KID7.npy", np.ones(4, np.float32))
    np.save(betas / "betas_SUB2_S1_R1_T2_KID9.npy", np.full(4, 3.0, np.float32))
    got = dict(averaged_rows(str(betas)))
    assert set(got) == {7, 9}


def test_empty_behavior_file_skips_session(tmp_path):
    p = tmp_path / "b.csv"
    p.write_text("")
    assert read_behavior(str(p)) == []


def test_behavior_reader_formats(tmp_path):
    p = tmp_path / "b.tsv"
    p.write_text("SUBJECT\tSESSION\tRUN\tTRIAL\t73KID\n2\t1\t1\t1\t42\n"
                 "2\t2\t1\t1\t43\n")
    rows = read_behavior(str(p))
    assert [r["73KID"] for r in rows] == [42, 43]
    assert [r["73KID"] for r in read_behavior(str(p), session_index=2)] == [43]
    bad = tmp_path / "bad.csv"
    bad.write_text("SUBJECT,SESSION\n2,1\n")
    with pytest.raises(AssertionError, match="missing columns"):
        read_behavior(str(bad))


def test_preprocess_cli_from_sessions(tmp_path, capsys):
    sessions_dir, behav, caps_json, raw, schedule = _write_fixture(tmp_path)
    cfg = Config(top_k=20)
    cfg_path = tmp_path / "c.yaml"
    cfg.save(cfg_path)
    out_dir = tmp_path / "out"
    assert main([
        "preprocess", "--config", str(cfg_path), "--out", str(out_dir),
        "--from-sessions", str(sessions_dir), "--behavior", str(behav),
        "--captions-json", str(caps_json), "--n-sessions", "2",
    ]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["ingest"]["trials"] == 8
    assert report["pack"]["n_rows"] == 5          # repeats averaged
    assert report["voxel_stats"]["n_voxels"] == V
    assert report["tokenizer"]["n_captions"] == 10
    # packed rows equal the reference recipe
    from masters_thesis_tpu.data.pack import open_pack

    store = open_pack(str(out_dir / "betas_pack"))
    want, order = _reference_recipe(raw, schedule)
    assert store.keys.tolist() == order
    for i, kid in enumerate(order):
        np.testing.assert_allclose(np.asarray(store.data[i]), want[kid],
                                   rtol=1e-5, atol=1e-6)


def test_mgh_roundtrip_all_dtypes(tmp_path):
    """Pure-numpy MGH reader/writer: shapes, dtypes, gzip (.mgz), and the
    nibabel axis convention (V, 1, 1, T) for surface files."""
    from masters_thesis_tpu.data.preprocess.mgh import read_mgh, write_mgh

    rng = np.random.default_rng(0)
    surf = rng.standard_normal((6, 3)).astype(np.float32)  # (V, T)
    p = tmp_path / "lh.betas_session01.mgh"
    write_mgh(str(p), surf)
    got = read_mgh(str(p))
    assert got.shape == (6, 1, 1, 3)
    np.testing.assert_array_equal(np.squeeze(got), surf)

    pz = tmp_path / "x.mgz"
    write_mgh(str(pz), surf)
    np.testing.assert_array_equal(np.squeeze(read_mgh(str(pz))), surf)

    for dt in (np.uint8, np.int16, np.int32):
        ints = rng.integers(0, 120, (5, 2)).astype(dt)
        pi = tmp_path / f"i_{np.dtype(dt).name}.mgh"
        write_mgh(str(pi), ints)
        np.testing.assert_array_equal(
            np.squeeze(read_mgh(str(pi))), ints.astype(np.float32))

    # volume (4D) axis order survives the disk roundtrip
    vol = rng.standard_normal((3, 4, 5, 2)).astype(np.float32)
    pv = tmp_path / "vol.mgh"
    write_mgh(str(pv), vol)
    np.testing.assert_array_equal(read_mgh(str(pv)), vol)

    import pytest as _pytest

    bad = tmp_path / "trunc.mgh"
    bad.write_bytes(b"\x00" * 10)
    with _pytest.raises(ValueError, match="truncated"):
        read_mgh(str(bad))


def test_ingest_from_mgh_sessions(tmp_path):
    """The .mgh path of --from-sessions produces identical per-trial outputs
    to the .npy path (nsd_get_data.py:226-246 reads these via nibabel)."""
    from masters_thesis_tpu.data.preprocess.mgh import write_mgh

    sessions_dir, behav, caps_json, raw, schedule = _write_fixture(tmp_path)
    # convert the fixture's session files to .mgh (both hemispheres must
    # share an extension — find_session_files pairs them per ext)
    for f in sorted(sessions_dir.glob("*.npy")):
        arr = np.load(f)
        write_mgh(str(f.with_suffix("")) + ".mgh", arr.astype(np.float32))
        f.unlink()
    out = tmp_path / "ingested_mgh"
    report = ingest_sessions(str(sessions_dir), str(behav), str(out),
                             n_sessions=2, captions_json=str(caps_json))
    assert report["trials"] == 8
    arr = raw[1].astype(np.float32)
    z = (arr - arr.mean(axis=1, keepdims=True)) / arr.std(axis=1, keepdims=True)
    got = np.load(out / "subj_2" / "betas" / "betas_SUB2_S1_R1_T2_KID12.npy")
    np.testing.assert_allclose(got, z[:, 1].astype(np.float32), rtol=1e-5,
                               atol=1e-6)


def test_glasser_atlas_from_mgz(tmp_path):
    from masters_thesis_tpu.data.preprocess.glasser import (
        groups_from_atlas,
        load_atlas_vector,
    )
    from masters_thesis_tpu.data.preprocess.mgh import write_mgh

    lh = np.array([0, 1, 2, 1, 2, 0], np.int32)
    rh = np.array([2, 0, 1, 1, 0, 2], np.int32)
    write_mgh(str(tmp_path / "lh.HCP_MMP1.mgz"), lh)
    write_mgh(str(tmp_path / "rh.HCP_MMP1.mgz"), rh)
    lh_v = load_atlas_vector(str(tmp_path / "lh.HCP_MMP1.mgz"))
    rh_v = load_atlas_vector(str(tmp_path / "rh.HCP_MMP1.mgz"))
    np.testing.assert_array_equal(lh_v, lh)
    groups = groups_from_atlas(lh_v, rh_v)
    # labels 1,2 per hemisphere -> 4 groups; RH offsets by len(lh)
    assert len(groups) == 4
    np.testing.assert_array_equal(groups[0], [1, 3])
    np.testing.assert_array_equal(groups[2], [8, 9])


def test_caption_prefix_stripped_for_tokenizer(tmp_path):
    from masters_thesis_tpu.data.captions import load_captions_dir

    d = tmp_path / "caps"
    d.mkdir()
    (d / "SUB2_KID9.txt").write_text(
        "/x/betas_SUB2_S1_R1_T1_KID9.npy#0\ta cat sleeps.\nplain caption.\n")
    caps = load_captions_dir(str(d))
    assert caps[9] == ["a cat sleeps.", "plain caption."]


def test_ingest_pairs_by_presentation_order_not_file_order(tmp_path):
    """Behavior rows written in a non-presentation order (e.g. exported
    sorted by 73KID) must still pair beta column t with the session's t-th
    presentation — silent mislabeling otherwise."""
    sessions_dir, behav, caps_json, raw, kid_schedule = _write_fixture(
        tmp_path, n_sessions=1)
    # rewrite the behavior file with rows shuffled (sorted by KID)
    lines = behav.read_text().splitlines()
    header, rows = lines[0], lines[1:]
    rows_sorted = sorted(rows, key=lambda ln: int(ln.split(",")[-1]))
    assert rows_sorted != rows  # the shuffle is real
    behav.write_text("\n".join([header] + rows_sorted) + "\n")

    out = tmp_path / "out"
    ingest_sessions(str(sessions_dir), str(behav), str(out), n_sessions=1,
                    zscore_data=False)
    # trial t's beta (raw column t) must be saved under kid_schedule[0][t]
    for t, kid in enumerate(kid_schedule[0]):
        path = (out / "subj_2" / "betas" /
                f"betas_SUB2_S1_R1_T{t + 1}_KID{kid}.npy")
        np.testing.assert_allclose(
            np.load(path), raw[1][:, t].astype(np.float32), rtol=1e-6)


def test_ingest_sanitizes_tabs_in_captions(tmp_path):
    """Tabs/CR in caption text would corrupt the '{path}#{i}\\t{caption}'
    line format that load_captions_dir splits on."""
    sessions_dir, behav, caps_json, raw, kid_schedule = _write_fixture(
        tmp_path, n_sessions=1)
    caps = {"11": ["a man\twalking a dog\r\nnear a tree"],
            "12": ["plain caption"], "13": ["x"], "14": ["y"], "15": ["z"]}
    caps_json.write_text(json.dumps(caps))
    out = tmp_path / "out"
    ingest_sessions(str(sessions_dir), str(behav), str(out), n_sessions=1,
                    captions_json=str(caps_json))
    from masters_thesis_tpu.data.captions import load_captions_dir

    got = load_captions_dir(str(out / "subj_2" / "captions"))
    assert got[11] == ["a man walking a dog  near a tree"]
