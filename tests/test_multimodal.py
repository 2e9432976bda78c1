"""Multimodal operator tests: real header bytes, real mapInPandas plumbing.

The decode step is stubbed (no codec libs in this container) — these tests
pin down (a) the REAL magic-byte sniffer against genuine PNG/JPEG/GIF/WAV
byte layouts built with struct.pack, (b) schemas/batch shapes/fan-out of
every stubbed operator, (c) that strict mode raises loudly instead of
silently faking."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators import multimodal as M


def png_bytes(width: int, height: int) -> bytes:
    ihdr = struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"
    return (
        M.PNG_MAGIC
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + b"\x00\x00\x00\x00"  # fake crc — sniffer must not care
    )


def jpeg_bytes(width: int, height: int) -> bytes:
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = b"\x08" + struct.pack(">HH", height, width) + b"\x03"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
        + b"\xff\xd9"
    )


def gif_bytes(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00" * 6


def wav_bytes(sample_rate: int, channels: int, n_samples: int) -> bytes:
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    data = b"\x00" * (n_samples * channels * 2)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_sniff_bytes_pure():
    png = M.sniff_bytes(png_bytes(640, 480))
    assert (png["mime"], png["width"], png["height"]) == ("image/png", 640, 480)

    jpg = M.sniff_bytes(jpeg_bytes(1920, 1080))
    assert (jpg["mime"], jpg["width"], jpg["height"]) == ("image/jpeg", 1920, 1080)

    gif = M.sniff_bytes(gif_bytes(32, 16))
    assert (gif["mime"], gif["width"], gif["height"]) == ("image/gif", 32, 16)

    wav = M.sniff_bytes(wav_bytes(16000, 2, 16000))  # exactly 1 s
    assert (wav["mime"], wav["sample_rate"], wav["channels"]) == ("audio/wav", 16000, 2)
    assert wav["duration_ms"] == 1000

    assert M.sniff_bytes(b"plain text")["mime"] == "application/octet-stream"
    assert M.sniff_bytes(None)["n_bytes"] == 0
    # truncated header: degrade, never raise
    assert M.sniff_bytes(M.PNG_MAGIC + b"\x00\x00")["mime"] == "image/png"


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, png_bytes(100, 50)),
        (2, jpeg_bytes(640, 480)),
        (3, gif_bytes(8, 8)),
        (4, wav_bytes(8000, 1, 4000)),
        (5, b"not media at all"),
        (6, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, content binary")


def test_sniff_metadata_df(assets):
    got = {r["doc_id"]: r.asDict() for r in M.sniff_metadata(assets).collect()}
    assert got[1]["mime"] == "image/png" and got[1]["width"] == 100
    assert got[2]["mime"] == "image/jpeg" and got[2]["height"] == 480
    assert got[3]["mime"] == "image/gif" and got[3]["width"] == 8
    assert got[4]["mime"] == "audio/wav" and got[4]["duration_ms"] == 500
    assert got[5]["mime"] == "application/octet-stream"
    assert got[6]["n_bytes"] == 0 and got[6]["mime"] == "application/octet-stream"
    assert len(got) == 6


def test_decode_strict_raises(assets):
    with pytest.raises(Exception, match="codec libraries|NotImplementedError"):
        M.decode_image(assets, mode="strict").collect()


def test_decode_fake_deterministic(assets):
    a = {r["doc_id"]: r["pixels"] for r in M.decode_image(assets, mode="fake").collect()}
    b = {r["doc_id"]: r["pixels"] for r in M.decode_image(assets, mode="fake").collect()}
    assert a == b
    assert all(len(px) == 64 for px in a.values())
    assert all(0 <= v <= 255 for v in a[1])


def test_resize_shapes(assets):
    out = M.resize_image(assets, 4, 3, mode="fake").collect()
    assert all(len(r["content"]) == 12 for r in out)
    assert all((r["width"], r["height"]) == (4, 3) for r in out)


def test_sample_frames_fanout(assets):
    out = M.sample_frames(assets, every_nth=5, max_frames=3, mode="fake")
    rows = out.collect()
    assert len(rows) == 6 * 3
    idxs = sorted({r["frame_idx"] for r in rows})
    assert idxs == [0, 5, 10]
    assert all(len(r["frame"]) == 16 for r in rows)


def test_extract_features(assets):
    out = M.extract_features(assets, dim=8).collect()
    assert all(len(r["feature"]) == 8 for r in out)
    assert all(0.0 <= v < 1.0 for r in out for v in r["feature"])
    # feature is a pure function of content: same bytes → same vector
    a = M.extract_features(assets, dim=8).collect()
    assert sorted(map(str, a)) == sorted(map(str, out))


def test_partition_rebalance_plumbs(assets):
    df = M.sniff_metadata(assets, partitions=4)
    assert df.rdd.getNumPartitions() == 4
