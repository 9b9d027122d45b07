"""Real pure-Python media codecs + the mapInPandas extraction plumbing."""

import struct

from pyspark.sql import functions as F

from rdf_mapper_spark.ops.multimodal import (
    _decode_ppm,
    _decode_wav,
    _feature_vector,
    encode_ppm,
    encode_wav,
    extract_features,
    synth_media,
)


def test_ppm_round_trip_and_comment_header():
    rgb = bytes(range(48))  # 4x4 RGB
    w, h, got = _decode_ppm(encode_ppm(4, 4, rgb))
    assert (w, h, got) == (4, 4, rgb)
    # comments between header tokens are legal PPM
    with_comment = b"P6\n# a comment\n4 4\n255\n" + rgb
    assert _decode_ppm(with_comment) == (4, 4, rgb)
    try:
        _decode_ppm(b"P5\n4 4\n255\n" + rgb)
        raise AssertionError("P5 must be rejected")
    except ValueError:
        pass


def test_wav_round_trip():
    samples = [0, 100, -100, 32767, -32768, 7]
    assert _decode_wav(encode_wav(samples)) == samples


def test_feature_vectors_hand_computed():
    rgb = bytes([10, 20, 30] * 4)  # 2x2 image
    img = _feature_vector(encode_ppm(2, 2, rgb), "image")
    assert img == [2.0, 2.0, 4.0, float(sum(rgb)), 10.0, 30.0, 10.0, 30.0]

    s = [5, -3, 0, 8]
    au = _feature_vector(encode_wav(s), "audio")
    #        n    sum|s| min  max  crossings  n>0  first last
    assert au == [4.0, 16.0, -3.0, 8.0, 1.0, 2.0, 5.0, 8.0]

    raw = bytes([1, 2, 3, 200])
    vid = _feature_vector(raw, "video")
    assert vid == [4.0, 206.0, 1.0, 200.0, 1.0, 200.0, 0.0, 0.0]


def test_synth_media_payloads_really_decode(spark):
    d = spark.createDataFrame(
        [(i, f"document body number {i} with some words", 37 + i)
         for i in range(9)],
        ["doc_id", "text", "n_chars"])
    media = synth_media(d).collect()
    by_kind = {}
    for r in media:
        by_kind.setdefault(r.kind, []).append(r)
    assert set(by_kind) == {"image", "audio", "video"}
    for r in by_kind["image"]:
        w, h, rgb = _decode_ppm(bytes(r.payload))
        assert (w, h) == (r.width, r.height) and len(rgb) == w * h * 3
    for r in by_kind["audio"]:
        s = _decode_wav(bytes(r.payload))
        assert len(s) > 0 and all(-32768 <= x <= 32767 for x in s)
        assert r.duration_ms == len(s) * 1000 // 8000
    # wav container really is RIFF framing, not raw bytes
    assert bytes(by_kind["audio"][0].payload)[:4] == b"RIFF"

    feats = extract_features(spark.createDataFrame(media)).collect()
    assert len(feats) == 9
    for r in feats:
        assert len(r.feature) == 8
        # integer-valued by construction (exactness contract)
        assert all(float(x) == int(x) for x in r.feature)


def test_extract_features_plan_is_arrow_batched(spark):
    d = spark.createDataFrame(
        [(1, "words here", 10)], ["doc_id", "text", "n_chars"])
    plan = (extract_features(synth_media(d))
            ._jdf.queryExecution().executedPlan().toString())
    # mapInPandas shows as MapInPandas / ArrowEvalPython, never row-wise
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
