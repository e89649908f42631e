"""TensorBoard bridge: hand-encoded event files must be readable by the real
TensorBoard machinery (reference UX: `main.py:241-243`)."""

import struct

import numpy as np
import pytest

from layoutdm_tpu.utils.tb import (
    EventsWriter,
    _encode_event,
    _masked_crc,
    _scalar_summary,
    crc32c,
)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_record_framing_and_scalars(tmp_path):
    d = str(tmp_path / "logs")
    w = EventsWriter(d)
    w.scalar("loss", 1.5, 1)
    w.scalar("loss", 0.25, 2)
    w.close()

    import os

    f = os.path.join(d, os.listdir(d)[0])
    raw = open(f, "rb").read()
    # parse TFRecord frames manually, checking both CRCs
    off, recs = 0, []
    while off < len(raw):
        header = raw[off : off + 8]
        (ln,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", raw[off + 8 : off + 12])
        assert hcrc == _masked_crc(header)
        payload = raw[off + 12 : off + 12 + ln]
        (pcrc,) = struct.unpack("<I", raw[off + 12 + ln : off + 16 + ln])
        assert pcrc == _masked_crc(payload)
        recs.append(payload)
        off += 16 + ln
    assert len(recs) == 3  # file_version + 2 scalars


def test_events_readable_by_tensorboard(tmp_path):
    tb_backend = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator"
    )
    from PIL import Image

    d = str(tmp_path / "logs")
    w = EventsWriter(d)
    vals = [3.0, 1.0, 0.5]
    for i, v in enumerate(vals):
        w.scalar("train/loss", v, i)
    w.image("samples", Image.new("RGB", (8, 6), (200, 10, 10)), 2)
    w.close()

    acc = tb_backend.EventAccumulator(d)
    acc.Reload()
    assert acc.Tags()["scalars"] == ["train/loss"]
    got = [(s.step, s.value) for s in acc.Scalars("train/loss")]
    assert [s for s, _ in got] == [0, 1, 2]
    np.testing.assert_allclose([v for _, v in got], vals, rtol=1e-6)
    im = acc.Images("samples")[0]
    assert (im.step, im.width, im.height) == (2, 8, 6)
    assert im.encoded_image_string[:8] == b"\x89PNG\r\n\x1a\n"
