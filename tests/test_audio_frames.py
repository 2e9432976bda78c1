"""MP3/ADTS frame-header metadata tier (operators/audio.py, round 8)."""

from __future__ import annotations

import pytest

from occupation_wage_etl_spark.operators import audio as A


def test_mp3_chain_round_trip_with_id3():
    data = A.encode_mp3_fixture(
        [5, 7, 5], sr_idx=1, paddings=[0, 1, 0], mode=3, id3_bytes=17
    )
    m = A.parse_mp3(data)
    assert m["sample_rate"] == 48000
    assert m["channels"] == 1
    assert m["n_frames"] == 3
    # 144000*64//48000 = 192; +1 padding on the middle 96kbps frame
    assert m["frame_bytes"] == [192, 289, 192]
    assert m["bitrates"] == [64, 96, 64]


def test_adts_chain_round_trip():
    data = A.encode_adts_fixture([20, 33], profile=1, sfi=4, channels=2)
    m = A.parse_adts(data)
    assert m["sample_rate"] == 44100
    assert m["channels"] == 2
    assert m["frame_bytes"] == [27, 40]
    assert m["profile"] == 1
    assert m["samples_per_frame"] == 1024


def test_audio_corruption_raises():
    good = A.encode_mp3_fixture([5, 5])
    with pytest.raises(ValueError, match="lost sync"):
        A.parse_mp3(b"\x12\x34" + good)
    with pytest.raises(ValueError, match="extends past end"):
        A.parse_mp3(good[:-10])
    with pytest.raises(ValueError, match="reserved bitrate"):
        # bitrate index 15 is forbidden
        bad = bytearray(good)
        bad[2] = (bad[2] & 0x0F) | 0xF0
        A.parse_mp3(bytes(bad))
    adts = A.encode_adts_fixture([20])
    with pytest.raises(ValueError, match="extends past end"):
        A.parse_adts(adts[:-5])
    with pytest.raises(ValueError, match="lost sync"):
        A.parse_adts(b"\x00" + adts)


def test_sniff_audio_container():
    assert A.sniff_audio_container(A.encode_mp3_fixture([5])) == "mp3"
    assert (
        A.sniff_audio_container(A.encode_mp3_fixture([5], id3_bytes=4))
        == "mp3"
    )
    assert A.sniff_audio_container(A.encode_adts_fixture([9])) == "adts"
    assert A.sniff_audio_container(b"\x89PNG") is None


def test_audio_frame_stats_operator(spark):
    rows = [
        (0, A.encode_mp3_fixture([5, 5, 5], sr_idx=0, mode=0)),
        (1, A.encode_adts_fixture([10, 20, 30], sfi=3, channels=1)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r for r in A.audio_frame_stats(df).collect()}
    mp3 = got[0]
    assert mp3["container"] == "mp3"
    assert mp3["sample_rate"] == 44100
    assert mp3["is_cbr"] is True
    assert mp3["duration_ms"] == 3 * 1152 * 1000 // 44100
    adts = got[1]
    assert adts["container"] == "adts"
    assert adts["sample_rate"] == 48000
    assert adts["channels"] == 1
    assert adts["is_cbr"] is False
    assert (adts["min_frame_bytes"], adts["max_frame_bytes"]) == (17, 37)



# ---------------------------------------------- FLAC + ID3 (round 8)


def test_flac_streaminfo_round_trip():
    import hashlib

    data = A.encode_flac_fixture(
        sample_rate=96000, channels=1, bits_per_sample=24,
        total_samples=123456, md5=hashlib.md5(b"7").digest(), padding=12,
    )
    m = A.parse_flac_streaminfo(data)
    assert m["sample_rate"] == 96000
    assert m["channels"] == 1
    assert m["bits_per_sample"] == 24
    assert m["total_samples"] == 123456
    assert m["n_metadata_blocks"] == 2
    assert m["md5_hex"] == hashlib.md5(b"7").hexdigest()
    # 36-bit total-sample boundary
    big = A.encode_flac_fixture(total_samples=(1 << 36) - 1)
    assert A.parse_flac_streaminfo(big)["total_samples"] == (1 << 36) - 1


def test_flac_corruption_raises():
    good = A.encode_flac_fixture()
    with pytest.raises(ValueError, match="bad magic"):
        A.parse_flac_streaminfo(b"OggS" + good[4:])
    with pytest.raises(ValueError, match="overruns"):
        A.parse_flac_streaminfo(A.encode_flac_fixture(padding=20)[:-8])
    # first block must be STREAMINFO
    bad = bytearray(good)
    bad[4] = 0x81  # PADDING as first block
    with pytest.raises(ValueError, match="not STREAMINFO"):
        A.parse_flac_streaminfo(bytes(bad))


def test_id3_frames_round_trip_and_padding_stop():
    t = A.encode_id3v2_fixture(
        {"TIT2": "t", "TPE1": "a", "TALB": "b", "TRCK": "3"}, padding=9
    )
    m = A.parse_id3v2_frames(t)
    assert m["n_frames"] == 4
    assert m["frames"]["TIT2"] == "t"
    assert m["frames"]["TRCK"] == "3"
    with pytest.raises(ValueError, match="bad magic"):
        A.parse_id3v2_frames(b"XXX" + t[3:])
    with pytest.raises(ValueError, match="overruns"):
        A.parse_id3v2_frames(t[:-12])


def test_flac_and_id3_operators(spark):
    import hashlib

    rows = [
        (1, A.encode_flac_fixture(sample_rate=22050, total_samples=44100,
                                  md5=hashlib.md5(b"1").digest())),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    r = A.flac_streaminfo(df).collect()[0]
    assert r["duration_ms"] == 2000
    assert r["md5_hex"] == hashlib.md5(b"1").hexdigest()
    tag = A.encode_id3v2_fixture({"TIT2": "x", "TRCK": "2"})
    df2 = spark.createDataFrame([(2, tag)], "doc_id long, content binary")
    r2 = A.id3_tags(df2).collect()[0]
    assert r2["title"] == "x" and r2["album"] is None
    assert r2["n_frames"] == 2

if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_sniff_metadata_knows_new_containers(spark):
    from occupation_wage_etl_spark.operators import multimodal as mm
    from occupation_wage_etl_spark.operators import video as V

    mp4 = V.encode_mp4_fixture(
        [dict(handler="vide", codec="avc1", timescale=600,
              sample_delta=100, sizes=[20], sync=[1], width=64, height=48)]
    )
    rows = [
        (1, mp4),
        (2, A.encode_mp3_fixture([5, 5], sr_idx=1)),
        (3, A.encode_adts_fixture([10, 10], sfi=3)),
        (4, A.encode_flac_fixture(sample_rate=22050, total_samples=44100)),
        (5, A.encode_mp3_fixture([5])[:3]),  # truncated: mime-only
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r for r in mm.sniff_metadata(df).collect()}
    assert got[1]["mime"] == "video/mp4"
    assert (got[1]["width"], got[1]["height"]) == (64, 48)
    assert got[2]["mime"] == "audio/mpeg"
    assert got[2]["sample_rate"] == 48000
    assert got[2]["duration_ms"] == 2 * 1152 * 1000 // 48000
    assert got[3]["mime"] == "audio/aac"
    assert got[3]["sample_rate"] == 48000
    assert got[4]["mime"] == "audio/flac"
    assert got[4]["duration_ms"] == 2000
    assert got[5]["mime"] == "audio/mpeg"  # sniffed, parse failed
    assert got[5]["duration_ms"] is None
