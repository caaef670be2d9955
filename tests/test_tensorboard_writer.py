import glob
import struct

from masters_thesis_tpu.utils.tensorboard import EventWriter, _masked_crc


def _read_records(path):
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header), "header crc mismatch"
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            assert pcrc == _masked_crc(payload), "payload crc mismatch"
            records.append(payload)
    return records


def test_event_file_framing_and_contents(tmp_path):
    w = EventWriter(str(tmp_path))
    w.scalar("loss", 1.5, step=3)
    w.scalars({"a": 1.0, "b": 2.0}, step=4, prefix="epoch/")
    w.text("captions", "a dog runs", step=5)
    w.close()

    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(files[0])
    # header + 3 events
    assert len(records) == 4
    assert b"brain.Event:2" in records[0]
    assert b"loss" in records[1]
    assert struct.pack("<f", 1.5) in records[1]
    assert b"epoch/a" in records[2] and b"epoch/b" in records[2]
    assert b"a dog runs" in records[3]
