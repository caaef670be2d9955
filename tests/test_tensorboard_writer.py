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


def test_image_summary_round_trip(tmp_path):
    """Write an image event, re-parse the record framing, verify the PNG
    payload and Summary.Image fields survive."""
    import struct

    import numpy as np

    from masters_thesis_tpu.utils.tensorboard import (
        EventWriter,
        encode_png,
        render_caption_image,
    )

    rgb = np.zeros((4, 6, 3), np.uint8)
    rgb[..., 0] = 255
    png = encode_png(rgb)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"

    w = EventWriter(str(tmp_path))
    w.image("cap/x", png, 4, 6, step=3)
    w.close()

    fname = [f for f in tmp_path.iterdir()][0]
    data = fname.read_bytes()
    # skip the version-header record, then read the image record
    off = 0
    records = []
    while off < len(data):
        (ln,) = struct.unpack_from("<Q", data, off)
        off += 12  # len + len-crc
        records.append(data[off : off + ln])
        off += ln + 4  # payload + payload-crc
    assert len(records) == 2
    assert png in records[1]  # encoded_image_string embedded verbatim
    assert b"cap/x" in records[1]

    # matplotlib renderer returns a decodable PNG and plausible dims
    png2, h2, w2 = render_caption_image(rgb, "a test caption")
    assert png2[:8] == b"\x89PNG\r\n\x1a\n"
    assert h2 > 50 and w2 > 50


def test_png_encoder_matches_matplotlib_decode(tmp_path):
    import matplotlib.image as mpimg
    import numpy as np

    from masters_thesis_tpu.utils.tensorboard import encode_png

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (16, 8, 3)).astype(np.uint8)
    p = tmp_path / "x.png"
    p.write_bytes(encode_png(rgb))
    back = mpimg.imread(str(p))  # float32 [0,1]
    np.testing.assert_array_equal(
        (back[..., :3] * 255).round().astype(np.uint8), rgb
    )


def test_empty_scalars_writes_nothing(tmp_path):
    """scalars({}) must be a no-op — the old code emitted a second
    file_version record mid-file."""
    import glob
    import os

    from masters_thesis_tpu.utils.tensorboard import EventWriter

    w = EventWriter(str(tmp_path))
    (path,) = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents*"))
    size_after_header = os.path.getsize(path)
    w.scalars({}, step=1)
    w.close()
    assert os.path.getsize(path) == size_after_header


def test_caption_image_dims_match_png(tmp_path):
    """render_caption_image must report the EMITTED PNG's dimensions
    (bbox_inches='tight' crops the canvas)."""
    import struct

    import numpy as np

    from masters_thesis_tpu.utils.tensorboard import render_caption_image

    img = np.zeros((50, 80, 3), np.uint8)
    png, h, w = render_caption_image(img, "a caption")
    pw, ph = struct.unpack(">II", png[16:24])
    assert (w, h) == (pw, ph)


def test_two_writers_same_second_distinct_files(tmp_path):
    import glob
    import os

    from masters_thesis_tpu.utils.tensorboard import EventWriter

    a = EventWriter(str(tmp_path))
    b = EventWriter(str(tmp_path), filename_suffix=".x")
    a.scalar("t", 1.0, 0)
    b.scalar("t", 2.0, 0)
    a.close(); b.close()
    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents*"))
    assert len(files) == 2
