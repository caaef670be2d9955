"""End-to-end real-data layout test: synthesize an on-disk NSD-shaped dataset
(conditions CSVs, KID caption txts, beta pack, atlas label vectors) and train
through the real-data branch of experiment.build_data."""

import numpy as np

from masters_thesis_tpu.config import Config
from masters_thesis_tpu.data.pack import write_pack
from masters_thesis_tpu.experiment import build_data, run_training


def _make_dataset(root, n_unique=20, n_shared=6, n_test=3, n_voxels=96):
    nsd = root / "nsd"
    caps = root / "caps"
    betas = root / "betas"
    nsd.mkdir()
    caps.mkdir()
    rng = np.random.default_rng(0)

    unique = list(range(1, n_unique + 1))
    shared = list(range(100, 100 + n_shared))
    test = shared[:n_test]
    lines = ["nsd_key,is_shared"]
    lines += [f"{k},0" for k in unique]
    lines += [f"{k},1" for k in shared]
    (nsd / "subj02_conditions.csv").write_text("\n".join(lines))
    (nsd / "test_conditions.csv").write_text(
        "\n".join(["nsd_key"] + [str(k) for k in test])
    )

    words = "a the dog cat runs sits park red blue".split()
    for k in unique + shared:
        caps_lines = [
            " ".join(rng.choice(words, size=5)) + "." for _ in range(5)
        ]
        (caps / f"KID{k}.txt").write_text("\n".join(caps_lines))

    all_keys = unique + shared
    rows = rng.standard_normal((len(all_keys), n_voxels)).astype(np.float32)
    write_pack(str(betas), all_keys, rows)

    # 2-hemisphere atlas labels over n_voxels concatenated vertices
    half = n_voxels // 2
    lh = np.repeat([0, 1, 2], [half - 8, 4, 4])
    rh = np.repeat([0, 1], [half - 6, 6])
    np.save(nsd / "glasser_lh.npy", lh)
    np.save(nsd / "glasser_rh.npy", rh)
    return nsd, caps, betas


def test_real_data_build_and_train(tmp_path):
    nsd, caps, betas = _make_dataset(tmp_path)
    cfg = Config(
        run="real", model="lc_nic", epochs=1, batch_size=8, max_length=8,
        top_k=30, units=16, attn_units=8, group_size=4, embedding_text=8,
        log=str(tmp_path / "logs"),
    )
    cfg.dataset.betas_path = str(betas)
    cfg.dataset.captions_path = str(caps)
    cfg.dataset.nsd_dir = str(nsd)

    split, pairs, tok, store, groups = build_data(cfg)
    assert len(split.train) == 20
    assert len(split.val) == 3   # shared minus test
    assert len(split.test) == 3
    assert len(groups) == 3      # labels {1,2} LH + {1} RH
    assert store.row_shape == (96,)
    assert len(pairs["train"]) == 100  # 20 keys x 5 captions

    run_path, logs, bundle = run_training(cfg, epochs=1)
    assert np.isfinite(logs["loss"])


def test_groups_to_remove_applied(tmp_path):
    """cfg.groups_to_remove drops regions before the encoder is built — the
    flagship trains on 345 of 360 (AttemptFour/main.py:115). Out-of-range
    indices (the 360-space list against a small atlas) are ignored."""
    nsd, caps, betas = _make_dataset(tmp_path)
    cfg = Config(
        run="sel", model="lc_nic", epochs=1, batch_size=8, max_length=8,
        top_k=30, units=16, attn_units=8, group_size=4, embedding_text=8,
        log=str(tmp_path / "logs"), groups_to_remove=[1, 142, 17],
    )
    cfg.dataset.betas_path = str(betas)
    cfg.dataset.captions_path = str(caps)
    cfg.dataset.nsd_dir = str(nsd)

    split, pairs, tok, store, groups = build_data(cfg)
    assert len(groups) == 2  # 3 groups, index 1 removed; 142/17 out of range

    run_path, logs, bundle = run_training(cfg, epochs=1)
    assert np.isfinite(logs["loss"])
    # the persisted layout (used to rebuild the model for serving) reflects
    # the selection
    from masters_thesis_tpu.ops.group_layout import GroupLayout

    layout = GroupLayout.load(f"{run_path}/layout.npz")
    assert layout.n_groups == 2


def test_flagship_config_carries_15_region_removal():
    import os

    cfg = Config.load(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs", "attempt_four.yaml")
    )
    assert len(cfg.groups_to_remove) == 15
    assert 142 in cfg.groups_to_remove


def _make_two_subject_dataset(root, n_voxels=96):
    """Subject A via _make_dataset, plus subject B: its own conditions CSV
    (different unique keys), caption files, and betas dir."""
    nsd, caps, betas = _make_dataset(root, n_voxels=n_voxels)
    rng = np.random.default_rng(7)

    unique_b = list(range(50, 66))           # 16 unique keys for B
    shared = list(range(100, 106))           # same shared keys as A
    lines = ["nsd_key,is_shared"]
    lines += [f"{k},0" for k in unique_b]
    lines += [f"{k},1" for k in shared]
    (nsd / "subj05_conditions.csv").write_text("\n".join(lines))

    caps_b = root / "caps_b"
    caps_b.mkdir()
    words = "a the dog cat runs sits park red blue".split()
    for k in unique_b + shared:
        caps_lines = [
            " ".join(rng.choice(words, size=5)) + "." for _ in range(5)
        ]
        (caps_b / f"KID{k}.txt").write_text("\n".join(caps_lines))

    betas_b = root / "betas_b"
    betas_b.mkdir()
    for k in unique_b + shared:
        np.save(betas_b / f"subj05_KID{k}.npy",
                rng.standard_normal(n_voxels).astype(np.float32))
    return nsd, caps, betas, caps_b, betas_b


def test_two_subject_ms2_real_data(tmp_path):
    """ms2_nic + betas_path_b loads BOTH subjects: train pairs carry real
    subject ids (no pseudo-subject fallback), B keys are offset, the
    combined store serves both, and every training batch is [A ; B]."""
    from masters_thesis_tpu.data.pairs import encode_pairs
    from masters_thesis_tpu.experiment import B_KEY_OFFSET

    nsd, caps, betas, caps_b, betas_b = _make_two_subject_dataset(tmp_path)
    cfg = Config(
        run="ms2_real", model="ms2_nic", epochs=1, batch_size=8, max_length=8,
        top_k=30, units=16, attn_units=8, group_size=4, embedding_text=8,
        log=str(tmp_path / "logs"),
    )
    cfg.dataset.betas_path = str(betas)
    cfg.dataset.captions_path = str(caps)
    cfg.dataset.betas_path_b = str(betas_b)
    cfg.dataset.captions_path_b = str(caps_b)
    cfg.dataset.nsd_dir = str(nsd)

    split, pairs, tok, store, groups = build_data(cfg)
    subs = {p[4] for p in pairs["train"]}
    assert subs == {"A", "B"}
    n_a = sum(p[4] == "A" for p in pairs["train"])
    n_b = sum(p[4] == "B" for p in pairs["train"])
    assert n_a == 100 and n_b == 80     # (20 and 16 unique keys) x 5
    # B keys offset; combined store covers both key spaces
    b_keys = [p[0] for p in pairs["train"] if p[4] == "B"]
    assert min(b_keys) >= B_KEY_OFFSET
    assert store.indices_for(np.asarray([1, 50 + B_KEY_OFFSET])).shape == (2,)
    # test split stays subject A (raw keys)
    assert all(p[0] < B_KEY_OFFSET for p in pairs["test"])

    # real subject ids -> subject_split engages without the pseudo fallback
    enc = encode_pairs(pairs["train"], tok, cfg.max_length)
    assert set(np.unique(enc.subjects)) == {0, 1}

    run_path, logs, bundle = run_training(cfg, epochs=1)
    assert np.isfinite(logs["loss"])
    with open(f"{run_path}/log.log") as f:
        assert "pseudo-subject" not in f.read()


def test_two_subject_ms_nic_shared_encoder(tmp_path):
    """ms_nic (shared encoder, main_ms_single_enc.py) trains on the mixed
    two-subject pair list with plain shuffling — equal-halves loss equals
    the batch mean, so no split layout is needed."""
    nsd, caps, betas, caps_b, betas_b = _make_two_subject_dataset(tmp_path)
    cfg = Config(
        run="ms_real", model="ms_nic", epochs=1, batch_size=8, max_length=8,
        top_k=30, units=16, attn_units=8, group_size=4, embedding_text=8,
        log=str(tmp_path / "logs"),
    )
    cfg.dataset.betas_path = str(betas)
    cfg.dataset.captions_path = str(caps)
    cfg.dataset.betas_path_b = str(betas_b)
    cfg.dataset.captions_path_b = str(caps_b)
    cfg.dataset.nsd_dir = str(nsd)

    split, pairs, tok, store, groups = build_data(cfg)
    assert {p[4] for p in pairs["train"]} == {"A", "B"}
    run_path, logs, bundle = run_training(cfg, epochs=1)
    assert np.isfinite(logs["loss"])


def test_pca_preprocess_writes_reduced_pack_and_trains(tmp_path):
    """The ThinkAndTell PCA chain end-to-end: preprocess --pca fits on the
    TRAIN split (SVD/svd.py fits on the unique 27k, not val/test) and writes
    the reduced pack that input_kind: pca configs actually train on — the
    saved model alone was never a usable training input."""
    from masters_thesis_tpu.experiment import run_preprocess

    nsd, caps, betas = _make_dataset(tmp_path)
    # run_preprocess ingests per-key npy files (the my_get_betas output),
    # not an existing pack — explode the fixture pack into that layout
    from masters_thesis_tpu.data.pack import open_pack as _open

    src = _open(str(betas))
    raw = tmp_path / "raw_betas"
    raw.mkdir()
    for i, key in enumerate(src.keys.tolist()):
        np.save(raw / f"subj02_KID{key}.npy", np.asarray(src.data[i]))
    cfg = Config(
        run="pca_chain", model="thinkandtell", epochs=1, batch_size=8,
        max_length=8, top_k=30, units=16, embedding_features=16,
        log=str(tmp_path / "logs"),
    )
    cfg.dataset.betas_path = str(raw)
    cfg.dataset.captions_path = str(caps)
    cfg.dataset.nsd_dir = str(nsd)
    cfg.input_kind = "pca"
    cfg.input.pca = 4

    out = tmp_path / "pre"
    report = run_preprocess(cfg, str(out), pca_components=4)
    assert report["pca"]["fit_on"] == "train_split:20"
    assert report["pca"]["n_rows"] == 26

    from masters_thesis_tpu.data.pack import open_pack

    reduced = open_pack(report["pca"]["pack"])
    assert reduced.row_shape == (4,)

    # the reduced pack trains the pca config directly
    cfg.dataset.betas_path = report["pca"]["pack"]
    run_path, logs, bundle = run_training(cfg, epochs=1)
    assert bundle["store"].row_shape == (4,)
    assert np.isfinite(logs["loss"])


def test_vc_preprocess_writes_masked_pack_and_trains(tmp_path):
    """The visual-cortex chain end-to-end: preprocess --vc-parcels builds the
    vertex mask from the run's atlases (ThinkAndTell/train.py:78-113) and
    writes the masked pack input_kind: vc configs train on; the parcel list
    parses from the reference's VISUAL_MASK CSV layout (index column +
    header)."""
    from masters_thesis_tpu.experiment import run_preprocess

    nsd, caps, betas = _make_dataset(tmp_path)
    from masters_thesis_tpu.data.pack import open_pack as _open

    src = _open(str(betas))
    raw = tmp_path / "raw_betas"
    raw.mkdir()
    for i, key in enumerate(src.keys.tolist()):
        np.save(raw / f"subj02_KID{key}.npy", np.asarray(src.data[i]))

    # reference-style CSV: header row + per-row index column
    vm = tmp_path / "visual_mask.csv"
    vm.write_text(",parcel\n0,1\n1,2\n")

    cfg = Config(
        run="vc_chain", model="thinkandtell", epochs=1, batch_size=8,
        max_length=8, top_k=30, units=16, embedding_features=16,
        log=str(tmp_path / "logs"),
    )
    cfg.dataset.betas_path = str(raw)
    cfg.dataset.captions_path = str(caps)
    cfg.dataset.nsd_dir = str(nsd)
    cfg.input_kind = "vc"

    out = tmp_path / "pre"
    report = run_preprocess(cfg, str(out), vc_parcels=str(vm))
    assert report["vc"]["parcels"] == [1, 2]
    mask = np.load(out / "vc_mask.npy")
    # fixture atlases: LH has 4x label-1 + 4x label-2, RH has 6x label-1
    assert report["vc"]["n_vertices"] == len(mask) == 14

    from masters_thesis_tpu.data.pack import open_pack

    masked = open_pack(report["vc"]["pack"])
    assert masked.row_shape == (14,)
    # masked values are the original columns at the mask indices
    np.testing.assert_array_equal(
        np.asarray(masked.data[0]), np.asarray(src.data[0])[mask])

    cfg.input.vc = 14
    cfg.dataset.betas_path = report["vc"]["pack"]
    run_path, logs, bundle = run_training(cfg, epochs=1)
    assert bundle["store"].row_shape == (14,)
    assert np.isfinite(logs["loss"])


def test_preprocess_chain_vc_normalize_pca_and_transform_replay(tmp_path):
    """Stages CHAIN in the reference's order (mask -> normalize -> reduce:
    ThinkAndTell masks to VC, normalizes at load time with data_mean stats,
    and SVD reduces that data), and `mtt transform` replays the recorded
    chain on arbitrary rows — serving inputs must match the training pack."""
    import json as _json

    from masters_thesis_tpu.cli import main
    from masters_thesis_tpu.data.pack import open_pack as _open
    from masters_thesis_tpu.experiment import (
        apply_preprocess_chain,
        run_preprocess,
    )

    nsd, caps, betas = _make_dataset(tmp_path)
    src = _open(str(betas))
    raw = tmp_path / "raw_betas"
    raw.mkdir()
    for i, key in enumerate(src.keys.tolist()):
        np.save(raw / f"subj02_KID{key}.npy", np.asarray(src.data[i]))

    cfg = Config(run="chain", model="thinkandtell", epochs=1, batch_size=8,
                 max_length=8, top_k=30, units=16, embedding_features=16,
                 log=str(tmp_path / "logs"))
    cfg.dataset.betas_path = str(raw)
    cfg.dataset.captions_path = str(caps)
    cfg.dataset.nsd_dir = str(nsd)

    out = tmp_path / "pre"
    report = run_preprocess(cfg, str(out), pca_components=4,
                            vc_parcels="1,2", normalize=True)
    assert report["transform"]["stages"] == ["vc_mask", "normalize", "pca"]

    # each stage consumed the previous: norm pack is VC-wide, pca is 4-wide
    assert _open(report["normalize"]["pack"]).row_shape == (14,)
    final = _open(report["pca"]["pack"])
    assert final.row_shape == (4,)

    # the normalized view is normalized with TRAIN-split statistics only
    # (stats over val/test would leak their rows into the training inputs)
    assert report["normalize"]["stats_from"] == "train_split:20"
    norm_store = _open(report["normalize"]["pack"])
    norm = np.asarray(norm_store.data)
    train_rows = [i for i, k in enumerate(norm_store.keys.tolist())
                  if int(k) <= 20]
    np.testing.assert_allclose(norm[train_rows].mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(norm[train_rows].std(axis=0), 1.0, atol=1e-4)

    # replaying the chain on the RAW rows reproduces the final pack exactly
    # (align by key: the derived packs order rows by ingest-file order)
    replayed = apply_preprocess_chain(str(out), np.asarray(src.data))
    src_row = {int(k): i for i, k in enumerate(src.keys.tolist())}
    aligned = replayed[[src_row[int(k)] for k in final.keys.tolist()]]
    np.testing.assert_allclose(aligned, np.asarray(final.data), atol=1e-5)

    # and the CLI surface does the same
    x = tmp_path / "x.npy"
    np.save(x, np.asarray(src.data[:3]))
    y = tmp_path / "y.npy"
    assert main(["transform", "--pre", str(out), "--betas", str(x),
                 "--out", str(y)]) == 0
    np.testing.assert_allclose(np.load(y), replayed[:3], atol=1e-6)


def test_features_pack_trains_img_nic(tmp_path):
    """The image chain end-to-end: mtt features --pack writes the extraction
    output as a key-addressed pack that dataset.betas_path consumes, so an
    img_nic config trains directly on it (the reference dumps per-key conv
    files that data_generator_image reads; a flat features .npy had no path
    into training)."""
    import json as _json

    from masters_thesis_tpu.cli import main

    nsd, caps, betas = _make_dataset(tmp_path)
    keys = np.asarray(sorted(
        list(range(1, 21)) + list(range(100, 106))), np.int64)
    rng = np.random.default_rng(0)
    images = tmp_path / "imgs.npy"
    np.save(images, rng.integers(
        0, 255, (int(keys.max()), 32, 32, 3)).astype(np.float32))
    keys_npy = tmp_path / "keys.npy"
    np.save(keys_npy, keys)

    pack_dir = tmp_path / "feat_pack"
    assert main(["features", "--backbone", "vgg16", "--head", "conv5",
                 "--images", str(images), "--keys", str(keys_npy),
                 "--out", str(pack_dir), "--pack",
                 "--batch-size", "8"]) == 0

    from masters_thesis_tpu.data.pack import open_pack

    feats = open_pack(str(pack_dir))
    assert len(feats) == 26 and len(feats.row_shape) == 2  # (P, C)

    cfg = Config(
        run="img_chain", model="img_nic", epochs=1, batch_size=8,
        max_length=8, top_k=30, units=16, attn_units=8,
        embedding_features=32, embedding_text=8, log=str(tmp_path / "logs"),
    )
    cfg.dataset.betas_path = str(pack_dir)
    cfg.dataset.captions_path = str(caps)
    cfg.dataset.nsd_dir = str(nsd)
    run_path, logs, bundle = run_training(cfg, epochs=1)
    assert bundle["store"].row_shape == feats.row_shape
    assert np.isfinite(logs["loss"])


def test_parse_visual_parcels_formats(tmp_path):
    """CSV parsing is structural: a pandas unnamed-index header (',0') must
    not parse as parcel 0 (the unlabelled region — the mask would explode to
    most of cortex), and a stored plain list must not lose its first value
    to an index heuristic."""
    from masters_thesis_tpu.experiment import _parse_visual_parcels

    # inline list
    assert _parse_visual_parcels("1,2,3") == [1, 2, 3]
    # pandas to_csv with unnamed index: header ',0', data 'i,label'
    f1 = tmp_path / "pandas.csv"
    f1.write_text(",0\n0,1\n1,2\n")
    assert _parse_visual_parcels(str(f1)) == [1, 2]
    # named header without index column
    f2 = tmp_path / "named.csv"
    f2.write_text("parcel\n4\n5\n")
    assert _parse_visual_parcels(str(f2)) == [4, 5]
    # plain numeric file: every field is a value
    f3 = tmp_path / "plain.csv"
    f3.write_text("1,2,3\n")
    assert _parse_visual_parcels(str(f3)) == [1, 2, 3]
    # junk inside data rows fails loudly
    f4 = tmp_path / "bad.csv"
    f4.write_text("parcel\nV1\n")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-numeric"):
        _parse_visual_parcels(str(f4))


def test_transform_replay_rejects_wrong_raw_width(tmp_path):
    from masters_thesis_tpu.experiment import (
        apply_preprocess_chain,
        run_preprocess,
    )

    nsd, caps, betas = _make_dataset(tmp_path)
    from masters_thesis_tpu.data.pack import open_pack as _open

    src = _open(str(betas))
    raw = tmp_path / "raw_betas"
    raw.mkdir()
    for i, key in enumerate(src.keys.tolist()):
        np.save(raw / f"subj02_KID{key}.npy", np.asarray(src.data[i]))
    cfg = Config(run="w", model="thinkandtell", top_k=30,
                 log=str(tmp_path / "logs"))
    cfg.dataset.betas_path = str(raw)
    cfg.dataset.nsd_dir = str(nsd)
    out = tmp_path / "pre"
    run_preprocess(cfg, str(out), vc_parcels="1,2")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="recorded on rows"):
        apply_preprocess_chain(str(out), np.zeros((2, 400), np.float32))


def test_train_split_indices_picks_covering_subject(tmp_path):
    """Two subjects' conditions CSVs in one nsd_dir: the split fit must use
    the CSV whose keys actually cover the pack (alphabetical-first would
    silently fit subject 1's split on subject 2's pack)."""
    from masters_thesis_tpu.data.pack import open_pack as _open
    from masters_thesis_tpu.experiment import _train_split_indices

    nsd, caps, betas = _make_dataset(tmp_path)  # subj02: keys 1..20,100..105
    # an earlier-sorting subject with disjoint keys
    lines = ["nsd_key,is_shared"] + [f"{k},0" for k in range(500, 520)]
    (nsd / "subj01_conditions.csv").write_text("\n".join(lines))

    idx, note = _train_split_indices(_open(str(betas)), str(nsd))
    assert note == "train_split:20"
    assert len(idx) == 20


def test_parse_visual_parcels_named_index_and_trailing_commas(tmp_path):
    """Round-5 review regressions: a NAMED serial index column must be
    dropped (row numbers — incl. 0, the unlabelled region — must not leak
    into the mask), and trailing commas on a value list must not demote
    its first row to a 'header'."""
    from masters_thesis_tpu.experiment import _parse_visual_parcels

    named = tmp_path / "named.csv"
    named.write_text("idx,parcel\n0,7\n1,8\n2,9\n")
    assert _parse_visual_parcels(str(named)) == [7, 8, 9]

    one_based = tmp_path / "one_based.csv"
    one_based.write_text("region,parcel\n1,7\n2,8\n3,9\n")
    assert _parse_visual_parcels(str(one_based)) == [7, 8, 9]

    trailing = tmp_path / "trailing.csv"
    trailing.write_text("1,2,3,\n4,5,6,\n")
    assert _parse_visual_parcels(str(trailing)) == [1, 2, 3, 4, 5, 6]

    # a non-serial first column is DATA, not an index — every field counts
    data_first = tmp_path / "data_first.csv"
    data_first.write_text("a,b\n7,8\n9,10\n")
    assert _parse_visual_parcels(str(data_first)) == [7, 8, 9, 10]
