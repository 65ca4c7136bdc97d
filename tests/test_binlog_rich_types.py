"""The byte tier's full type system + CRC32 checksums: the
independently-encoded CRC32 fixture (binlog_v4_rich.bin, authored
by tests/fixtures/binlog_wire_encoder.py — no shared code with the
decoder) decodes digit-exactly, checksummed corruption is refused,
randomized values round-trip encoder→decoder (hypothesis), and the
decimal exactness guarantee (reference ``UseDecimal: true``,
``internal/sync_server/sync.go:52``) survives the full
galaxy_binlog source → projection chain with NO float transit."""

from __future__ import annotations

import os
import shutil

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from galaxy_spark.cdc.binlog import decode_binlog, mq_rows_from_binlog

RICH = os.path.join(os.path.dirname(__file__), "fixtures",
                    "binlog_v4_rich.bin")

ROW1 = ["101", "12345678.9999", "99999999999999999999", "2024-02-29",
        "2024-02-29 23:59:59.1234", "2024-03-01 00:00:05",
        "838:59:58.99", "utf8 text payload ✓", "2024", "8388607",
        "label-one", "-7", "2.5",
        '{"k":1,"tags":["a","b"],"price":19.9900}']
ROW2 = ["102", "-0.0100", "0", "1970-01-01",
        "1999-12-31 00:00:00.0000", "2038-01-19 03:14:07",
        "-00:00:01.00", "0x00ff807f", "0000", "-8388608",
        "x" * 260, None, None, None]
ROW2_V2 = ["102", "-987654.3210", "0", "1970-01-01",
           "1999-12-31 00:00:00.0000", "2038-01-19 03:14:07",
           "-00:00:01.00", "rewritten", "0000", "-8388608",
           "x" * 260, "42", "0.125",
           '[1,2.5,"three",false,{"nested":null}]']


def _blob() -> bytes:
    with open(RICH, "rb") as f:
        return f.read()


def test_rich_fixture_golden_decode():
    """Every supported column type decodes to its canonical MySQL
    text: digit-exact decimals (trailing zeros kept to scale,
    20-digit integer DECIMAL exact), leap-day DATE, DATETIME2(4)
    and TIMESTAMP2(0) at the 2038 boundary, TIME2 extremes
    (838:59:58.99 and a NEGATIVE fractional time), BLOB as UTF-8
    text vs hex for true binary, YEAR 0000, INT24 both extremes,
    2-byte-length VARCHAR, and NULLs under the bitmap."""
    events = decode_binlog(_blob())
    assert [e.kind for e in events] == [
        "format_description", "previous_gtids", "gtid", "query",
        "rows_query", "insert", "update", "delete", "xid", "gtid",
        "query", "heartbeat", "rotate"]
    by = {e.kind: e for e in events}
    assert by["gtid"].gtid is not None
    assert events[2].gtid == \
        "3e11fa47-0000-11e9-b213-00505690d3a0:42"
    assert events[9].gtid.endswith(":43")      # anonymous
    assert by["rows_query"].query == "INSERT INTO payments VALUES (...)"
    ins, upd, dele = by["insert"], by["update"], by["delete"]
    assert ins.rows == [[ROW1], [ROW2]]
    assert upd.rows == [[ROW2, ROW2_V2]]
    assert dele.rows == [[ROW1]]
    assert events[-1].next_file == "binlog.000002"
    assert events[-1].log_pos == os.path.getsize(RICH)


def test_crc32_corruption_raises():
    """Flipping one payload byte in a rows event must fail its CRC
    loudly (the MySQL 5.6+ default is binlog_checksum=CRC32; a
    relay that relays bit-rot corrupts downstream silently)."""
    blob = bytearray(_blob())
    # find the WRITE_ROWS event (type 30) and flip a mid-body byte
    off = 4
    while True:
        etype = blob[off + 4]
        esize = int.from_bytes(blob[off + 9:off + 13], "little")
        if etype == 30:
            blob[off + 40] ^= 0xFF
            break
        off += esize
    with pytest.raises(ValueError, match="checksum mismatch"):
        decode_binlog(bytes(blob))


def test_fde_checksum_mismatch_raises():
    """A FORMAT_DESCRIIPTION that claims CRC32 but fails its own
    checksum is refused outright — trusting it would mis-frame
    every subsequent event by 4 bytes."""
    blob = bytearray(_blob())
    blob[30] ^= 0x01                     # inside the FDE body
    with pytest.raises(ValueError, match="FORMAT_DESCRIPTION"):
        decode_binlog(bytes(blob))


def _single_column_stream(col_type: int, meta: int, value) -> bytes:
    from tests.fixtures.binlog_wire_encoder import BinlogWriter

    w = BinlogWriter()
    w.format_description()
    w.table_map(5, "d", "t", [(col_type, meta)])
    w.write_rows(5, [(col_type, meta)], [[value]])
    return w.bytes()


def _decode_single(col_type: int, meta: int, value) -> str:
    rows = mq_rows_from_binlog(_single_column_stream(col_type, meta,
                                                     value))
    assert len(rows) == 1
    return rows[0][3][0][0]


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_newdecimal_roundtrip_property(data):
    """Randomized DECIMAL(p, s) values round-trip the independent
    encoder -> decoder digit-exactly (both sides written separately
    against the public packed layout; agreement on random values is
    the in-sandbox substitute for a server-captured fixture)."""
    precision = data.draw(st.integers(1, 30))
    scale = data.draw(st.integers(0, precision))
    intg = precision - scale
    int_digits = data.draw(st.text("0123456789", min_size=0,
                                   max_size=intg))
    frac_digits = data.draw(st.text("0123456789", min_size=scale,
                                    max_size=scale))
    neg = data.draw(st.booleans())
    ip = int_digits.lstrip("0") or "0"
    if neg and ip == "0" and set(frac_digits) <= {"0"}:
        neg = False                      # MySQL normalizes -0
    text = ("-" if neg else "") + ip
    if scale:
        text += "." + frac_digits
    meta = precision | (scale << 8)
    assert _decode_single(246, meta, text) == text


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_temporal_roundtrip_property(data):
    """Randomized DATE / DATETIME2 / TIMESTAMP2 / TIME2 values
    (fsp 0/2/4/6, negative times included) round-trip exactly."""
    kind = data.draw(st.sampled_from(["date", "dt2", "ts2", "time2"]))
    fsp = data.draw(st.sampled_from([0, 2, 4, 6]))
    frac = ("" if fsp == 0 else
            "." + data.draw(st.text("0123456789", min_size=fsp,
                                    max_size=fsp)))
    if kind == "date":
        y = data.draw(st.integers(1000, 9999))
        m, d = data.draw(st.integers(1, 12)), data.draw(st.integers(1, 28))
        text = f"{y:04d}-{m:02d}-{d:02d}"
        assert _decode_single(10, 0, text) == text
    elif kind == "dt2":
        y = data.draw(st.integers(1000, 9999))
        m, d = data.draw(st.integers(1, 12)), data.draw(st.integers(1, 28))
        h, mi, s = (data.draw(st.integers(0, 23)),
                    data.draw(st.integers(0, 59)),
                    data.draw(st.integers(0, 59)))
        text = (f"{y:04d}-{m:02d}-{d:02d} "
                f"{h:02d}:{mi:02d}:{s:02d}{frac}")
        assert _decode_single(18, fsp, text) == text
    elif kind == "ts2":
        secs = data.draw(st.integers(1, 2**32 - 1))
        from datetime import datetime, timezone

        text = (datetime.fromtimestamp(secs, timezone.utc)
                .strftime("%Y-%m-%d %H:%M:%S") + frac)
        assert _decode_single(17, fsp, text) == text
    else:
        h = data.draw(st.integers(0, 838))
        mi, s = (data.draw(st.integers(0, 59)),
                 data.draw(st.integers(0, 59)))
        neg = data.draw(st.booleans())
        if neg and h == 0 and mi == 0 and s == 0 and (
                fsp == 0 or set(frac[1:]) <= {"0"}):
            neg = False                  # -00:00:00 normalizes
        text = ("-" if neg else "") + f"{h:02d}:{mi:02d}:{s:02d}{frac}"
        assert _decode_single(19, fsp, text) == text


def test_legacy_pre_564_formats_and_bit():
    """The pre-5.6.4 wire formats a 5.5-era binlog (or a 5.6 table
    never rebuilt) still uses: legacy TIMESTAMP (4-byte LE epoch),
    legacy DATETIME (u64 decimal-packed), legacy TIME (3-byte LE
    signed decimal-packed), NEWDATE (DATE's packing under code 14),
    and BIT (split bits%8/bytes metadata, big-endian value)."""
    from tests.fixtures.binlog_wire_encoder import bit_meta

    assert _decode_single(7, 0, "2009-02-13 23:31:30") \
        == "2009-02-13 23:31:30"
    assert _decode_single(12, 0, "9999-12-31 23:59:59") \
        == "9999-12-31 23:59:59"
    assert _decode_single(12, 0, "1000-01-01 00:00:00") \
        == "1000-01-01 00:00:00"
    assert _decode_single(11, 0, "838:59:59") == "838:59:59"
    assert _decode_single(11, 0, "-00:00:01") == "-00:00:01"
    assert _decode_single(14, 0, "2024-02-29") == "2024-02-29"
    assert _decode_single(16, bit_meta(1), 1) == "1"
    assert _decode_single(16, bit_meta(12), 0xABC) == str(0xABC)
    assert _decode_single(16, bit_meta(64), (1 << 63) | 5) \
        == str((1 << 63) | 5)


def test_geometry_decodes_to_ewkt():
    """GEOMETRY columns (SRID prefix + OGC WKB) render as
    SRID-tagged canonical WKT: point/linestring/polygon, the
    multi* variants (children drop their tags), and collections;
    big-endian or unknown WKB falls back to hex."""
    import struct as _s

    def le4(v):
        return v.to_bytes(4, "little")

    def pt(x, y):
        return b"\x01" + le4(1) + _s.pack("<dd", x, y)

    def poly(rings):
        out = b"\x01" + le4(3) + le4(len(rings))
        for r in rings:
            out += le4(len(r)) + b"".join(
                _s.pack("<dd", x, y) for x, y in r)
        return out

    assert _decode_single(255, 4, (4326, pt(1.5, -2.0))) \
        == "SRID=4326;POINT(1.5 -2.0)"
    sq = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)]
    assert _decode_single(255, 4, (0, poly([sq]))) == \
        "SRID=0;POLYGON((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 0.0))"
    multi = b"\x01" + le4(6) + le4(1) + poly(
        [[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]])
    assert _decode_single(255, 4, (31370, multi)) == (
        "SRID=31370;MULTIPOLYGON(((0.0 0.0, 1.0 0.0, 1.0 1.0, "
        "0.0 0.0)))")
    coll = b"\x01" + le4(7) + le4(2) + pt(9.0, 9.0) + pt(1.0, 2.0)
    assert _decode_single(255, 4, (0, coll)) == \
        "SRID=0;GEOMETRYCOLLECTION(POINT(9.0 9.0), POINT(1.0 2.0))"
    assert _decode_single(255, 4, (0, b"\x00\xde\xad")).startswith(
        "SRID=0;0x00dead")


def test_char_enum_set_string_family():
    """TYPE_STRING(254) carries three real types behind its packed
    2-byte metadata: CHAR (upper length bits xor-folded into the
    type byte — both the 1-byte and 2-byte length-prefix regimes),
    ENUM (index in 1-2 bytes; the label list lives in the table
    def, so the INDEX is the faithful wire value, same as
    go-mysql), and SET (bitmask)."""
    from tests.fixtures.binlog_wire_encoder import (enum_meta,
                                                    set_meta,
                                                    string_meta)

    assert _decode_single(254, string_meta(40), "char val") == "char val"
    assert _decode_single(254, string_meta(255), "x" * 255) == "x" * 255
    assert _decode_single(254, string_meta(600), "y" * 300) == "y" * 300
    assert _decode_single(254, enum_meta(1), 3) == "3"
    assert _decode_single(254, enum_meta(2), 300) == "300"
    assert _decode_single(254, set_meta(2), 0b1010) == "10"
    assert _decode_single(254, set_meta(8), (1 << 60) | 5) \
        == str((1 << 60) | 5)


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_json_binary_roundtrip_property(data):
    """Randomized JSON documents round-trip the independent JSON
    binary encoder -> decoder to the canonical compact JSON text
    (nested containers, every scalar width, inlined small values),
    and MySQL's opaque-NEWDECIMAL JSON decimals stay digit-exact."""
    import json as _json

    scalars = st.one_of(
        st.none(), st.booleans(),
        st.integers(-(2**62), 2**62),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=20))
    doc = data.draw(st.recursive(
        scalars,
        lambda kids: st.one_of(
            st.lists(kids, max_size=5),
            st.dictionaries(st.text(max_size=8), kids, max_size=5)),
        max_leaves=12))
    if doc is None:
        doc = False   # a top-level SQL-None rides the NULL bitmap,
        #               not JSON binary (that path is golden-tested)
    txt = _decode_single(245, 4, doc)
    assert txt == _json.dumps(doc, separators=(",", ":"),
                              ensure_ascii=False)


def test_json_decimal_exactness():
    from tests.fixtures.binlog_wire_encoder import JDec

    got = _decode_single(
        245, 4, {"a": JDec("-0.010000000000000000010", 21, 21)})
    assert got == '{"a":-0.010000000000000000010}'


def test_blob_text_vs_binary_rule():
    """TABLE_MAP cannot distinguish TEXT from BLOB (charset lives
    in the table def); the documented transport rule is UTF-8 when
    valid, 0x-hex otherwise — deterministic both ways."""
    assert _decode_single(252, 1, "héllo".encode()) == "héllo"
    assert _decode_single(252, 3, bytes([0xC3, 0x28])) == "0xc328"
    assert _decode_single(252, 4, b"") == ""


def test_rich_bytes_through_source_and_projection_decimal_exact(
        spark, tmp_path):
    """The exactness capstone: CRC32 wire bytes -> galaxy_binlog
    streaming source -> schema attach + P2-P4 projections; DECIMAL
    values arrive in the after/before images as the exact digit
    strings from the wire (never a float), including the 20-digit
    integer decimal a double would corrupt."""
    from pyspark.sql import functions as F

    from galaxy_spark.cdc.projections import project_changes
    from galaxy_spark.sources.binlog_source import BinlogDataSource

    d = str(tmp_path / "binlogs")
    os.makedirs(d)
    shutil.copy(RICH, os.path.join(d, "binlog.000001.bin"))
    try:
        spark.dataSource.register(BinlogDataSource)
    except Exception:
        pass
    cols = ["id", "amount", "big_int_dec", "paid_on", "created", "ts",
            "dur", "note", "yr", "cnt", "label", "qty", "ratio",
            "props"]
    raw = (spark.readStream.format("galaxy_binlog")
           .option("path", d).load())
    proj = project_changes(raw, cols)
    q = (proj.filter(~F.col("quarantined"))
         .select("action", "after", "before", "log_pos")
         .writeStream.format("memory").queryName("rich_proj")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM rich_proj").collect()
    by_action = {}
    for r in rows:
        by_action.setdefault(r.action, []).append(r)
    ins = sorted(by_action["insert"],
                 key=lambda r: r.after["id"])
    assert ins[0].after["amount"] == "12345678.9999"
    assert ins[0].after["big_int_dec"] == "99999999999999999999"
    assert float(ins[0].after["big_int_dec"]) != int(
        ins[0].after["big_int_dec"])     # a double WOULD corrupt it
    assert ins[1].after["amount"] == "-0.0100"
    (upd,) = by_action["update"]
    assert upd.before["amount"] == "-0.0100"
    assert upd.after["amount"] == "-987654.3210"
    assert upd.after["created"] == "1999-12-31 00:00:00.0000"
    assert upd.after["dur"] == "-00:00:01.00"
    (dele,) = by_action["delete"]
    assert dele.before["amount"] == "12345678.9999" and dele.after is None


def test_odd_fsp_fraction_is_mysql_scaled():
    """MySQL stores *2-temporal fractions scaled to 2*ceil(fsp/2)
    digits (fsp=1 -> centiseconds, fsp=3 -> 100us units), rendered
    to exactly fsp digits. Golden-byte assertions — not just a
    round-trip, which a convention shared by encoder and decoder
    would pass while both are 10x off (they were)."""
    from tests.fixtures.binlog_wire_encoder import (enc_datetime2,
                                                    enc_time2)
    from galaxy_spark.cdc.binlog import _Reader, _decode_value
    from galaxy_spark.cdc.binlog import TYPE_DATETIME2, TYPE_TIME2

    # DATETIME(3): .500 seconds must store as 5000 (units of 100us)
    blob = enc_datetime2("2024-02-29 12:00:00.500", 3)
    assert int.from_bytes(blob[5:7], "big") == 5000
    assert _decode_value(_Reader(blob), TYPE_DATETIME2, 3) \
        == "2024-02-29 12:00:00.500"

    # DATETIME(1): .9 must store as 90 centiseconds, render '.9'
    blob = enc_datetime2("2024-02-29 12:00:00.9", 1)
    assert blob[5] == 90
    assert _decode_value(_Reader(blob), TYPE_DATETIME2, 1) \
        == "2024-02-29 12:00:00.9"

    # TIME(5): fraction in microseconds across 3 bytes
    blob = enc_time2("01:02:03.00042", 5)
    assert _decode_value(_Reader(blob), TYPE_TIME2, 5) \
        == "01:02:03.00042"

    # negative TIME(1) with borrow across the packed boundary
    blob = enc_time2("-00:00:01.5", 1)
    assert _decode_value(_Reader(blob), TYPE_TIME2, 1) == "-00:00:01.5"


def test_legacy_fde_with_accidental_alg_byte_is_not_checksummed():
    """A pre-5.6.1 FDE has NO checksum trailer — body[-5] is just a
    post-header-length, and 1 is a legal length. Such a stream must
    decode as checksum=NONE, not raise 'checksum does not verify'
    (the old probe read the accidental byte as the alg byte, and
    the accidental CRC can essentially never verify)."""
    import struct

    from galaxy_spark.cdc.binlog import _detect_checksum, decode_binlog

    # hand-build a 5.5-era FDE: v4 header + 57 fixed bytes + a
    # post-header-length array whose LAST FIVE bytes start with 1
    body = (struct.pack("<H", 4) + b"5.5.62-log".ljust(50, b"\x00")
            + struct.pack("<I", 0) + bytes([19])
            + bytes(30) + bytes([1, 0, 0, 0, 0]))  # lengths, last-5 = 1,...
    header = struct.pack("<IBIIIH", 0, 15, 1, 19 + len(body), 0, 0)
    raw = header + body
    assert _detect_checksum(raw) is False
    events = decode_binlog(raw)
    assert events[0].kind == "format_description"


def test_unsigned_integers_decode_via_signedness_metadata():
    """The 8.0 TABLE_MAP SIGNEDNESS optional-metadata TLV flips the
    integer types to unsigned decode: INT UNSIGNED 4294967295 must
    render '4294967295', not '-1' (the wire bytes are identical —
    only the metadata distinguishes them). Without the TLV (pre-8.0
    writer) decode stays signed, and unknown TLV types are skipped
    by length."""
    from tests.fixtures.binlog_wire_encoder import BinlogWriter

    cols = [(1, 0), (2, 0), (9, 0), (3, 0), (8, 0), (15, 64)]
    vals = [255, 65535, 16777215, 4294967295, 2**64 - 1, "tail"]

    w = BinlogWriter()
    w.format_description()
    w.table_map(7, "d", "t", cols,
                unsigned=[True, True, True, True, True, False])
    w.write_rows(7, cols, [vals])
    rows = mq_rows_from_binlog(w.bytes())
    assert rows[0][3][0] == ["255", "65535", "16777215",
                            "4294967295", "18446744073709551615",
                            "tail"]

    # same bytes WITHOUT the TLV -> signed decode (old behavior)
    w2 = BinlogWriter()
    w2.format_description()
    w2.table_map(7, "d", "t", cols)
    w2.write_rows(7, cols, [vals])
    rows2 = mq_rows_from_binlog(w2.bytes())
    assert rows2[0][3][0] == ["-1", "-1", "-1", "-1", "-1", "tail"]

    # mixed signedness on one table
    w3 = BinlogWriter()
    w3.format_description()
    w3.table_map(7, "d", "t", cols,
                 unsigned=[False, True, False, True, False, False])
    w3.write_rows(7, cols, [vals])
    rows3 = mq_rows_from_binlog(w3.bytes())
    assert rows3[0][3][0] == ["-1", "65535", "-1", "4294967295",
                              "-1", "tail"]
