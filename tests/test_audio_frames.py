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


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
