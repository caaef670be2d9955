import json

from masters_thesis_tpu.evalsuite.coco_adapter import (
    load_coco_annotations,
    load_nsd_coco_map,
    score_against_coco,
    write_coco_results,
)


def test_coco_adapter_round_trip(tmp_path):
    (tmp_path / "map.csv").write_text("nsd_key,coco_id\n7,101\n9,202\n")
    mapping = load_nsd_coco_map(str(tmp_path / "map.csv"))
    assert mapping == {7: 101, 9: 202}

    res_path = tmp_path / "results.json"
    results = write_coco_results(
        str(res_path), [7, 9], ["a dog runs", "a red car"], mapping
    )
    assert results[0] == {"image_id": 101, "caption": "a dog runs"}
    assert json.loads(res_path.read_text())[1]["image_id"] == 202

    ann = {
        "annotations": [
            {"image_id": 101, "caption": "A dog runs fast."},
            {"image_id": 101, "caption": "The dog is running."},
            {"image_id": 202, "caption": "A red car parked."},
        ]
    }
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    gt = load_coco_annotations(str(tmp_path / "ann.json"))
    assert len(gt[101]) == 2

    scores = score_against_coco([7, 9], ["a dog runs", "a red car"], mapping, gt)
    assert scores["Bleu_1"] > 0.5


def test_stim_info_reader_and_export(tmp_path):
    """nsd_stim_info_merged.csv reader: 0-based nsdId -> 1-based nsd_key."""
    from masters_thesis_tpu.evalsuite.coco_adapter import (
        export_nsd_coco_csv,
        load_nsd_coco_map,
        load_stim_info,
        nsd_coco_map_from_stim_info,
    )

    stim = tmp_path / "nsd_stim_info_merged.csv"
    stim.write_text(
        "Unnamed: 0,nsdId,cocoId,cocoSplit\n"
        "0,0,531124,train2017\n"
        "1,1,104612,val2017\n"
        "2,72999,87531,train2017\n"
    )
    info = load_stim_info(str(stim))
    assert info[1] == {"coco_id": 531124, "coco_split": "train2017"}
    assert info[73000]["coco_id"] == 87531
    mapping = nsd_coco_map_from_stim_info(info)
    assert mapping[2] == 104612

    out_csv = tmp_path / "map.csv"
    assert export_nsd_coco_csv(str(stim), str(out_csv)) == 3
    assert load_nsd_coco_map(str(out_csv)) == mapping
