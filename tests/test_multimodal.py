"""Multimodal operator tests: the mapInPandas plumbing (schemas,
batch iteration, fan-out) verified against plain-numpy references
computed driver-side from the same synthesized payloads."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from galaxy_spark.operators import multimodal as mm
from galaxy_spark.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    return mm.synthesize_media(docs)


@pytest.fixture(scope="module")
def docs_local(spark):
    rows = load_table(spark, SF_SMOKE, "documents") \
        .select("doc_id", "text").collect()
    return {r.doc_id: r.text.encode("utf-8") for r in rows}


def test_synthesize_covers_all_modalities(media):
    got = {r.modality for r in
           media.select("meta.modality").distinct().collect()}
    assert got == {"image", "audio", "video"}


def test_decode_matches_numpy_reference(media, docs_local):
    decoded = {r.media_id: r for r in mm.decode_images(media).collect()}
    img_ids = [i for i in docs_local if i % 3 == 0]
    assert set(decoded) == set(img_ids)
    for mid in img_ids:
        payload = docs_local[mid]
        w = min(len(payload), 16)
        h = len(payload) // 16
        ref = np.frombuffer(payload, dtype=np.uint8)[: h * w]
        row = decoded[mid]
        assert (row.height, row.width) == (h, w)
        assert row.pixels == ref.astype(int).tolist()


def test_resize_nearest_neighbor(spark, media):
    resized = mm.resize_images(mm.decode_images(media), 8, 8).collect()
    assert resized
    for r in resized:
        assert (r.height, r.width) == (8, 8)
        assert len(r.pixels) == 64


def test_image_features_match_reference(media, docs_local):
    feats = {r.media_id: r for r in
             mm.image_features(mm.decode_images(media)).collect()}
    for mid, row in feats.items():
        payload = docs_local[mid]
        w = min(len(payload), 16)
        h = len(payload) // 16
        a = np.frombuffer(payload, dtype=np.uint8)[: h * w].astype(float)
        assert row.mean_px == pytest.approx(a.mean(), abs=1e-9)
        assert row.std_px == pytest.approx(a.std(), abs=1e-9)
        assert (row.min_px, row.max_px) == (a.min(), a.max())


def test_frame_sampling_fanout(media, docs_local):
    frames = mm.sample_frames(media, every_k=4, frame_bytes=64).collect()
    by_id: dict[int, list] = {}
    for f in frames:
        by_id.setdefault(f.media_id, []).append(f)
    for mid, payload in docs_local.items():
        if mid % 3 != 2:
            continue
        n_frames = len(payload) // 64
        expect = list(range(0, n_frames, 4))
        got = sorted(f.frame_idx for f in by_id.get(mid, []))
        assert got == expect, mid
        for f in by_id.get(mid, []):
            ref = payload[f.frame_idx * 64:(f.frame_idx + 1) * 64]
            assert bytes(f.frame) == ref


def test_audio_features_reference(media, docs_local):
    feats = {r.media_id: r for r in mm.audio_features(media).collect()}
    aud_ids = [i for i in docs_local if i % 3 == 1]
    assert set(feats) == set(aud_ids)
    for mid in aud_ids:
        wave = np.frombuffer(docs_local[mid], dtype=np.int8).astype(float)
        row = feats[mid]
        assert row.n_samples == wave.size
        assert row.rms == pytest.approx(np.sqrt((wave ** 2).mean()), rel=1e-12)
        zc = int(np.sum(np.signbit(wave[1:]) != np.signbit(wave[:-1])))
        assert row.zero_crossings == zc


def test_real_decode_contract():
    """r5: wav/png decode for REAL (stdlib codecs, round-trips
    pinned in tests/test_real_codecs.py); a truncated PNG is a
    ValueError, and video stays honestly unimplemented."""
    with pytest.raises(ValueError):
        mm.real_decode(b"\x89PNG", "png")     # signature only: corrupt
    with pytest.raises(NotImplementedError):
        mm.real_decode(b"\x00\x00\x00\x18ftypmp42", "mp4")


def test_frame_md5_query_consistency(spark, docs_local):
    """The registered query's md5 agrees with hashlib over raw bytes."""
    from galaxy_spark.registry import all_queries
    out = all_queries()["multimodal_frame_sample"](spark, SF_SMOKE).collect()
    for r in out[:20]:
        payload = docs_local[r.media_id]
        ref = hashlib.md5(
            payload[r.frame_idx * 64:(r.frame_idx + 1) * 64]).hexdigest()
        assert r.frame_md5 == ref


# ---- MP4 / ISO-BMFF container tier (r8) ---------------------------

def test_mp4_roundtrip_and_spark_pipeline(spark):
    """build_mp4 -> parse_mp4 round-trips every field, and the two
    Arrow stages carry real ISO-BMFF bytes through genuine Spark
    binary columns."""
    from galaxy_spark.operators.multimodal import (
        build_mp4, parse_mp4, video_container_metadata, wrap_mp4)

    m = parse_mp4(build_mp4(b"x" * 321, 16, 9, 321))
    assert m == {"brand": "isom", "timescale": 1000,
                 "duration_ms": 321, "n_tracks": 1, "codec": "avc1",
                 "width": 16, "height": 9, "codec_profile": 100,
                 "codec_level": 41, "nal_length_size": 4,
                 "mdat_bytes": 321}

    media = spark.createDataFrame(
        [(1, bytearray(b"abcd")), (2, bytearray(b"e" * 100))],
        "media_id long, payload binary")
    got = {r.media_id: r for r in
           video_container_metadata(wrap_mp4(media)).collect()}
    assert got[1].duration_ms == 4 and got[1].mdat_bytes == 4
    assert got[2].codec == "avc1" and got[2].n_tracks == 1


def test_mp4_version1_mvhd_largesize_and_unknown_boxes():
    """Spec coverage beyond the synthesis twin: version-1 mvhd
    (64-bit times), a 64-bit largesize mdat, an unknown top-level
    box (skipped by size), and two tracks (the 'vide' one wins the
    codec/dimension columns over a 'soun' track)."""
    import struct

    from galaxy_spark.operators.multimodal import (_MP4_MATRIX, _box,
                                                   parse_mp4)

    mvhd_v1 = _box(b"mvhd", b"\x01\x00\x00\x00"
                   + struct.pack(">QQIQ", 0, 0, 90000, 90000 * 7)
                   + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                   + bytes(8) + _MP4_MATRIX + bytes(24)
                   + struct.pack(">I", 3))

    def trak(handler, codec, w, h):
        tkhd = _box(b"tkhd", b"\x00\x00\x00\x01"
                    + struct.pack(">IIII", 0, 0, 1, 0)
                    + struct.pack(">I", 0) + bytes(8)
                    + struct.pack(">hhHH", 0, 0, 0, 0) + _MP4_MATRIX
                    + struct.pack(">II", w << 16, h << 16))
        hdlr = _box(b"hdlr", bytes(8) + handler + bytes(12) + b"t\x00")
        stsd = _box(b"stsd", bytes(4) + struct.pack(">I", 1)
                    + _box(codec, bytes(78)))
        mdia = _box(b"mdia", hdlr + _box(
            b"minf", _box(b"stbl", stsd)))
        return _box(b"trak", tkhd + mdia)

    moov = _box(b"moov", mvhd_v1
                + trak(b"soun", b"mp4a", 0, 0)
                + trak(b"vide", b"hvc1", 1920, 1080))
    payload = b"F" * 40
    mdat_large = (struct.pack(">I", 1) + b"mdat"
                  + struct.pack(">Q", 16 + len(payload)) + payload)
    blob = (_box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42")
            + _box(b"free", b"junk-the-parser-must-skip")
            + moov + mdat_large)

    m = parse_mp4(blob)
    assert m["brand"] == "mp42"
    assert m["timescale"] == 90000 and m["duration_ms"] == 7000
    assert m["n_tracks"] == 2
    assert m["codec"] == "hvc1"
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["mdat_bytes"] == 40
    # hvc1 carries no avcC: the AVC config columns stay null
    assert m["codec_profile"] is None and m["codec_level"] is None


def test_mp4_malformed_raises_with_box_context():
    import pytest as _pytest

    from galaxy_spark.operators.multimodal import (_box, build_mp4,
                                                   parse_mp4)

    with _pytest.raises(ValueError, match="no ftyp"):
        parse_mp4(b"\x00\x00\x00\x08junk")
    with _pytest.raises(ValueError, match="no moov"):
        parse_mp4(_box(b"ftyp", b"isom" + bytes(4)))
    whole = build_mp4(b"xy", 8, 8, 2)
    with _pytest.raises(ValueError, match="past span end|truncated"):
        parse_mp4(whole[:-5])                    # torn mdat


def test_mp4_frame_decode_still_honestly_refuses():
    import pytest as _pytest

    from galaxy_spark.operators.multimodal import build_mp4, real_decode

    with _pytest.raises(NotImplementedError,
                        match="container-metadata tier .* is already "
                              "real"):
        real_decode(build_mp4(b"z", 8, 8, 1), "mp4")


def test_mp4_refuses_short_boxes_instead_of_garbage():
    """Field reads are bounded by their box body: a 4-byte tkhd
    must raise, not 'return' a width read from the sibling box's
    header; an empty ftyp body must raise, not report the next
    box's size bytes as the brand (r8 review reproductions)."""
    import struct

    import pytest as _pytest

    from galaxy_spark.operators.multimodal import (_MP4_MATRIX, _box,
                                                   parse_mp4)

    with _pytest.raises(ValueError, match="ftyp major brand"):
        parse_mp4(_box(b"ftyp", b"") + _box(b"moov", b""))

    mvhd = _box(b"mvhd", bytes(4)
                + struct.pack(">IIII", 0, 0, 1000, 5)
                + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                + bytes(8) + _MP4_MATRIX + bytes(24)
                + struct.pack(">I", 2))
    short_trak = _box(b"trak", _box(b"tkhd", b"\x00\x00\x00\x01")
                      + _box(b"mdia", b""))
    blob = (_box(b"ftyp", b"isom" + bytes(4))
            + _box(b"moov", mvhd + short_trak))
    with _pytest.raises(ValueError, match="tkhd truncated"):
        parse_mp4(blob)


def test_mp4_nested_size_zero_box_refused():
    """A size-0 NESTED box (legal only as the last top-level box)
    would silently swallow every sibling — one corrupted byte must
    raise, not report a track-less movie."""
    import pytest as _pytest

    from galaxy_spark.operators.multimodal import (_box, build_mp4,
                                                   parse_mp4)

    whole = bytearray(build_mp4(b"zz", 8, 8, 2))
    # zero the mvhd size field inside moov: moov starts after ftyp
    ftyp_size = int.from_bytes(whole[0:4], "big")
    mvhd_off = ftyp_size + 8                     # moov body start
    assert whole[mvhd_off + 4:mvhd_off + 8] == b"mvhd"
    whole[mvhd_off:mvhd_off + 4] = b"\x00\x00\x00\x00"
    with _pytest.raises(ValueError, match="size-0 box"):
        parse_mp4(bytes(whole))


def test_mp4_unknown_duration_sentinel_is_null(spark):
    """All-ones mvhd duration (the spec's UNKNOWN sentinel, emitted
    by live/fragmented muxers) must surface as NULL duration_ms —
    the raw value overflowed int64 in the Arrow stage."""
    import struct

    from galaxy_spark.operators.multimodal import (
        _MP4_MATRIX, _box, parse_mp4, video_container_metadata)

    mvhd_v1 = _box(b"mvhd", b"\x01\x00\x00\x00"
                   + struct.pack(">QQI", 0, 0, 90000)
                   + b"\xff" * 8
                   + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                   + bytes(8) + _MP4_MATRIX + bytes(24)
                   + struct.pack(">I", 2))
    blob = (_box(b"ftyp", b"isom" + bytes(4))
            + _box(b"moov", mvhd_v1) + _box(b"mdat", b"x"))
    assert parse_mp4(blob)["duration_ms"] is None

    media = spark.createDataFrame([(1, bytearray(blob))],
                                  "media_id long, payload binary")
    (row,) = video_container_metadata(media).collect()
    assert row.duration_ms is None and row.timescale == 90000


def test_mp4_build_parse_roundtrip_property():
    """Hypothesis: build_mp4 -> parse_mp4 is the identity on every
    synthesis parameter across random payloads/dimensions/durations
    (the container twin of the binlog encoder round-trips)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from galaxy_spark.operators.multimodal import build_mp4, parse_mp4

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=300),
           st.integers(1, 4096), st.integers(1, 4096),
           st.integers(0, 10**9),
           st.integers(0, 255), st.integers(0, 255))
    def check(payload, w, h, dur, profile, level):
        m = parse_mp4(build_mp4(payload, w, h, dur,
                                profile=profile, level=level))
        assert m == {"brand": "isom", "timescale": 1000,
                     "duration_ms": dur, "n_tracks": 1,
                     "codec": "avc1", "width": w, "height": h,
                     "codec_profile": profile, "codec_level": level,
                     "nal_length_size": 4,
                     "mdat_bytes": len(payload)}

    check()
