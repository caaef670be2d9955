"""HCP-MMP1.0 parcel-name table (the shipped stand-in for the reference's
unshipped TrainData/unique_regions_list.csv, Eval/list_regions.py:33)."""

import numpy as np

from masters_thesis_tpu.data.preprocess.hcp_regions import (
    HCP_MMP1_REGIONS,
    load_names_csv,
    region_names,
)


def test_table_is_canonical_shape():
    assert len(HCP_MMP1_REGIONS) == 180
    assert len(set(HCP_MMP1_REGIONS)) == 180  # no duplicates
    # canonical anchor labels (Glasser et al. 2016 table order)
    assert HCP_MMP1_REGIONS[0] == "V1"      # label 1
    assert HCP_MMP1_REGIONS[22] == "MT"     # label 23
    assert HCP_MMP1_REGIONS[23] == "A1"     # label 24
    assert HCP_MMP1_REGIONS[119] == "H"     # label 120 (hippocampus)
    assert HCP_MMP1_REGIONS[179] == "p24"   # label 180


def test_region_names_aligns_with_group_order():
    names = region_names()
    assert len(names) == 360
    assert names[0] == "LH_V1" and names[180] == "RH_V1"
    assert names[359] == "RH_p24"


def test_region_names_respects_groups_to_remove():
    # removing group 0 (LH_V1) and 180 (RH_V1) shifts nothing else
    names = region_names(groups_to_remove=[0, 180])
    assert len(names) == 358
    assert names[0] == "LH_MST" and "LH_V1" not in names
    assert "RH_V1" not in names and "RH_MST" in names


def test_names_csv_override(tmp_path):
    csv = tmp_path / "names.csv"
    csv.write_text("region\n1,alpha\n2,beta\n")
    assert load_names_csv(str(csv)) == ["alpha", "beta"]
    names = region_names(names_csv=str(csv))
    assert names == ["LH_alpha", "LH_beta", "RH_alpha", "RH_beta"]


def test_analyze_emits_named_ranking(tmp_path):
    """A run with 360-wide attention gets a region_ranking with real
    parcel names in the analyze report."""
    import json

    from masters_thesis_tpu.cli import main

    run = tmp_path / "run"
    run.mkdir()
    attn = np.zeros((4, 3, 360), np.float32)
    attn[..., 22] = 1.0   # LH_MT dominates
    np.save(run / "attention_scores_7.npy", attn)

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["analyze", "--run", str(run)]) == 0
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    ranking = report["region_ranking_7"]
    assert ranking[0]["region"] == "LH_MT" and ranking[0]["index"] == 22


def test_analyze_betas_artifacts(tmp_path):
    """--betas emits the visualize_betas.py / tsne.py artifact set."""
    import contextlib
    import io
    import json

    from masters_thesis_tpu.cli import main

    run = tmp_path / "run"
    run.mkdir()
    rng = np.random.default_rng(3)
    betas = rng.standard_normal((12, 64)).astype(np.float32)
    np.save(tmp_path / "betas.npy", betas)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["analyze", "--run", str(run),
                     "--betas", str(tmp_path / "betas.npy")]) == 0
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    names = {a.rsplit("/", 1)[-1] for a in report["artifacts"]}
    assert {"betas_mean.png", "betas_l1norm.png", "betas_tsne.png"} <= names


def test_short_names_csv_on_removed_region_run_warns(tmp_path):
    """A --region-names CSV too short for the run's group space must fall
    back to index labels with a warning, not IndexError."""
    import contextlib
    import io
    import json

    import yaml

    from masters_thesis_tpu.cli import main

    run = tmp_path / "run"
    run.mkdir()
    removed = [0, 1]
    attn = np.random.default_rng(0).random((2, 3, 358)).astype(np.float32)
    np.save(run / "attention_scores_1.npy", attn)
    (run / "config.yaml").write_text(yaml.safe_dump(
        {"run": "t", "log": str(tmp_path / "log"),
         "groups_to_remove": removed}))
    csv = tmp_path / "short.csv"
    csv.write_text("alpha\nbeta\n")  # 2 names -> 4 regions, run needs 360
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["analyze", "--run", str(run),
                     "--region-names", str(csv)]) == 0
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert "region_names_warning" in report
    assert report["region_ranking_1"][0]["region"].startswith("region_")


def test_word_map_short_captions_file_is_skipped(tmp_path):
    """--word-map index beyond the captions file length is skipped, not an
    IndexError aborting the run."""
    import contextlib
    import io
    import json

    from masters_thesis_tpu.cli import main

    run = tmp_path / "run"
    run.mkdir()
    attn = np.random.default_rng(0).random((4, 3, 16)).astype(np.float32)
    np.save(run / "attention_scores_1.npy", attn)
    (run / "captions_1.txt").write_text("1\ta dog\n2\tthe cat\n")  # 2 < 4
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["analyze", "--run", str(run), "--word-map", "3"]) == 0
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    # basenames only: tmp_path itself embeds the test name ("word_map")
    names = {a.rsplit("/", 1)[-1] for a in report["artifacts"]}
    assert not any("word_map" in n for n in names)


def test_names_csv_skips_common_headers(tmp_path):
    csv = tmp_path / "h.csv"
    csv.write_text("index,region_name\n1,alpha\n2,beta\n")
    assert load_names_csv(str(csv)) == ["alpha", "beta"]
    # only the FIRST row is header-checked: a parcel actually named
    # 'label' mid-file survives
    csv2 = tmp_path / "h2.csv"
    csv2.write_text("parcel\nalpha\nlabel\n")
    assert load_names_csv(str(csv2)) == ["alpha", "label"]


def test_load_names_csv_bom_and_leading_blank(tmp_path):
    from masters_thesis_tpu.data.preprocess.hcp_regions import load_names_csv

    p = tmp_path / "names.csv"
    # Excel-style export: UTF-8 BOM, a leading blank line, then the header
    p.write_bytes("\xef\xbb\xbf\nindex,region_name\n1,V1\n2,MST\n".encode(
        "latin-1"))
    assert load_names_csv(str(p)) == ["V1", "MST"]
