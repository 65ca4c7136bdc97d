"""Byte-level binlog replay: the recorded wire-format fixture
(tests/fixtures/binlog_v4_sample.bin, layout documented in
make_binlog_fixture.py) decoded by galaxy_spark.cdc.binlog and run
through the engine's own S3/P1-P5 chain — closing the S1 fidelity
gap where the Debezium corpus starts one layer above the bytes
(reference decodes the same wire via go-mysql,
``internal/sync_server/sync.go:120-188``)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from galaxy_spark.cdc.binlog import decode_binlog, mq_rows_from_binlog

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "binlog_v4_sample.bin")
ORDERS_COLUMNS = ["id", "qty", "amount", "note"]  # P1's schema attach


def _blob() -> bytes:
    with open(FIXTURE, "rb") as f:
        return f.read()


def test_decode_stream_structure():
    """Event sequence, positions, and payloads come straight off
    the bytes: header chaining (log_pos strictly increasing to the
    stream length), dispatch per type code (S3), and the rotate's
    next-file handoff (C2's trigger)."""
    events = decode_binlog(_blob())
    kinds = [e.kind for e in events]
    assert kinds == ["format_description", "query", "insert", "update",
                     "delete", "xid", "query", "rotate"]
    positions = [e.log_pos for e in events]
    assert positions == sorted(positions)
    assert positions[-1] == os.path.getsize(FIXTURE)
    assert events[1].query == "BEGIN" and events[1].database == "shop"
    assert events[-2].query.startswith("ALTER TABLE orders ADD")
    assert events[-1].next_file == "binlog.000002"


def test_row_images_decode_to_reference_projection_inputs():
    """Row values (LONGLONG/LONG/DOUBLE/VARCHAR + a NULL under the
    null bitmap) decode into the exact positional org_row arrays
    the projection chain consumes; the update event carries a
    canonical (before, after) pair."""
    rows = mq_rows_from_binlog(_blob())
    assert rows == [
        ("shop", "orders", "insert", [["1", "3", "19.5", "first"]],
         1_700_000_000, 299),
        ("shop", "orders", "insert", [["2", "1", "5.25", "second"]],
         1_700_000_000, 299),
        ("shop", "orders", "update",
         [["2", "1", "5.25", "second"], ["2", "4", "21.0", "restocked"]],
         1_700_000_000, 390),
        ("shop", "orders", "delete", [["1", "3", "19.5", None]],
         1_700_000_000, 442),
    ]


def test_binlog_bytes_through_projection_chain(spark):
    """End-to-end S1->P2-P4: decoded bytes -> Spark rows -> schema
    attach -> project_changes, asserting the named before/after
    documents a consumer sees on the topic. This is the pipeline
    the Debezium-envelope tier starts in the middle of."""
    from galaxy_spark.cdc.projections import project_changes

    df = spark.createDataFrame(
        mq_rows_from_binlog(_blob()),
        "database string, `table` string, action string, "
        "org_row array<array<string>>, ts long, log_pos long")
    out = {(r.action, r.log_pos, tuple(sorted((r.before or {}).items())),
            tuple(sorted((r.after or {}).items())), r.quarantined)
           for r in project_changes(df, ORDERS_COLUMNS).collect()}

    ins1 = (("amount", "19.5"), ("id", "1"), ("note", "first"),
            ("qty", "3"))
    ins2 = (("amount", "5.25"), ("id", "2"), ("note", "second"),
            ("qty", "1"))
    upd_after = (("amount", "21.0"), ("id", "2"),
                 ("note", "restocked"), ("qty", "4"))
    assert out == {
        ("insert", 299, (), ins1, False),
        ("insert", 299, (), ins2, False),
        ("update", 390, ins2, upd_after, False),
        # delete's before-image carries the NULL note the null
        # bitmap encoded; map_from_arrays keeps the key, null value
        ("delete", 442, (("amount", "19.5"), ("id", "1"),
                         ("note", None), ("qty", "3")), (), False),
    }


def test_ddl_query_event_routes_to_schema_evolution():
    """The QUERY event's ALTER parses through the existing P5 path:
    decoded bytes feed cdc/ddl.py and evolve the column list the
    next TABLE_MAP-less consumer would attach."""
    from galaxy_spark.cdc.ddl import parse_alter

    ddl = [e for e in decode_binlog(_blob())
           if e.kind == "query" and e.query != "BEGIN"]
    assert len(ddl) == 1
    stmt = parse_alter(ddl[0].query)
    assert stmt is not None and stmt.table == "orders"
    (change,) = stmt.ops
    assert change.name == "coupon"
    assert parse_alter("BEGIN") is None  # tx markers don't evolve


def test_decoder_rejects_corrupt_streams():
    """A relay that guesses at bytes corrupts silently; ours
    refuses: truncation, mid-stream start (rows without TABLE_MAP),
    and unknown column types all raise."""
    import struct

    import pytest

    blob = _blob()
    with pytest.raises(ValueError, match="truncated|claims size"):
        decode_binlog(blob[:-7])
    # strip magic + FDE + BEGIN + TABLE_MAP: first rows event now
    # references an unseen table_id
    events = decode_binlog(blob)
    skip = 4
    sizes = []
    off = 4
    while off < len(blob):
        size = struct.unpack("<I", blob[off + 9:off + 13])[0]
        sizes.append(size)
        off += size
    headless = blob[4 + sizes[0] + sizes[1] + sizes[2]:]
    with pytest.raises(ValueError, match="unknown table_id"):
        decode_binlog(headless)
    assert len(events) == 8  # the intact stream still decodes


# --- property tests: arbitrary rows survive the wire ---------------

from hypothesis import given, settings
from hypothesis import strategies as st

_NOTE = st.one_of(st.none(), st.text(
    alphabet=st.characters(codec="utf-8",
                           blacklist_categories=("Cs",)),
    max_size=13))  # VARCHAR(40) -> 1-byte length prefix both sides


@settings(max_examples=60, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(-2**63, 2**63 - 1),      # LONGLONG id
              st.integers(-2**31, 2**31 - 1),      # LONG qty
              st.floats(allow_nan=False, allow_infinity=False,
                        width=64),                 # DOUBLE amount
              _NOTE),
    min_size=1, max_size=5))
def test_binlog_row_values_roundtrip(rows):
    """ANY (LONGLONG, LONG, DOUBLE, VARCHAR|NULL) row encoded to the
    wire layout by the spec-derived builder must decode back
    value-identical through the independent decoder — null bitmaps,
    negative ints, extreme doubles, multi-byte utf-8 included."""
    import tests.fixtures.make_binlog_fixture as B
    from galaxy_spark.cdc.binlog import decode_binlog

    s = B.Stream()
    s.event(15, B.fde_body())
    s.event(19, B.table_map_body())
    s.event(30, B.rows_body(
        [B.row_image(i, q, a, n) for i, q, a, n in rows]))
    (ev,) = [e for e in decode_binlog(s.bytes()) if e.kind == "insert"]
    got = [img for (img,) in (r for r in ev.rows)]
    want = [[str(i), str(q), str(a), n if n is None else n]
            for i, q, a, n in rows]
    assert got == want


def test_transaction_payload_event_refused_with_targeted_message():
    """MySQL 8.0.20+ with binlog_transaction_compression=ON wraps
    row events in a zstd Transaction_payload_event (type 40). This
    runtime has no zstd, so decode is impossible — but the refusal
    must NAME the server setting and the fix, not emit the generic
    unknown-type message an operator cannot act on."""
    import struct
    import zlib

    import pytest

    from galaxy_spark.cdc.binlog import decode_binlog
    from tests.fixtures.binlog_wire_encoder import BinlogWriter

    w = BinlogWriter()
    w.format_description()
    fde_stream = w.bytes()

    # type-40 body: TLV fields {type lenenc, len lenenc, value},
    # MySQL's OTW field codes: 1 = payload size (skippable),
    # 2 = compression type -> value 0 (zstd), then end mark
    body = (bytes([1, 2, 0x10, 0x00])        # payload size field
            + bytes([2, 1, 0])               # compression = zstd
            + bytes([0]))                    # OTW end mark
    size = 19 + len(body) + 4
    pos = len(fde_stream) - 4 + size
    header = (struct.pack("<IBIIIH", 1_710_000_000, 40, 7007, size,
                          pos, 0))
    ev = header + body
    blob = fde_stream + ev + struct.pack("<I", zlib.crc32(ev))

    with pytest.raises(ValueError,
                       match="binlog_transaction_compression"):
        decode_binlog(blob)
    with pytest.raises(ValueError, match="zstd"):
        decode_binlog(blob)


def test_transaction_payload_none_compression_decodes():
    """Algorithm-NONE type-40 payloads (the server emits these for
    small/incompressible transactions under
    binlog_transaction_compression=ON) are raw inner events — the
    decoder must decode them by recursion, not refuse them with a
    zstd message."""
    import struct
    import zlib

    from galaxy_spark.cdc.binlog import decode_binlog
    from tests.fixtures.binlog_wire_encoder import (LONG, VARCHAR,
                                                    BinlogWriter)

    # inner transaction: NO per-event checksums (the outer event's
    # trailer covers the payload), own TABLE_MAP
    inner = BinlogWriter(checksum="none")
    cols = [(LONG, 0), (VARCHAR, 32)]
    inner.query("shop", "BEGIN")
    inner.table_map(9, "shop", "orders", cols)
    inner.write_rows(9, cols, [[7, "wrapped"]])
    inner.xid(42)
    payload = inner.bytes()[4:]                  # strip magic

    def lenenc(v: int) -> bytes:
        return bytes([v]) if v < 251 else \
            b"\xfc" + struct.pack("<H", v)

    # MySQL's OTW field codes: 1 = payload size, 2 = compression
    # type (255 = NONE), 3 = uncompressed size
    psize = lenenc(len(payload))
    body = (lenenc(1) + lenenc(len(psize)) + psize
            + lenenc(2) + lenenc(len(lenenc(255))) + lenenc(255)
            + lenenc(3) + lenenc(len(psize)) + psize
            + lenenc(0)                          # OTW end mark
            + payload)

    outer = BinlogWriter(checksum="crc32")
    outer.format_description()
    stream = bytearray(outer.bytes())
    size = 19 + len(body) + 4
    pos = len(stream) - 4 + size
    header = struct.pack("<IBIIIH", 1_710_000_000, 40, 7007, size,
                         pos, 0)
    ev = header + body
    stream += ev + struct.pack("<I", zlib.crc32(ev))

    got = decode_binlog(bytes(stream))
    kinds = [e.kind for e in got]
    assert kinds == ["format_description", "query", "insert", "xid"]
    (ins,) = [e for e in got if e.kind == "insert"]
    assert ins.rows == [[["7", "wrapped"]]]
    assert ins.database == "shop" and ins.table == "orders"


def test_transaction_payload_omitted_field_defaults_to_none():
    """MySQL's writer OMITS the compression-type field for
    uncompressed payloads (libbinlogevents' read-side default is
    NONE) — a type-40 event with just the end mark + raw payload
    must decode, not be refused as zstd."""
    import struct
    import zlib

    from galaxy_spark.cdc.binlog import decode_binlog
    from tests.fixtures.binlog_wire_encoder import (LONG, VARCHAR,
                                                    BinlogWriter)

    inner = BinlogWriter(checksum="none")
    cols = [(LONG, 0), (VARCHAR, 32)]
    inner.table_map(9, "shop", "orders", cols)
    inner.write_rows(9, cols, [[8, "default-none"]])
    payload = inner.bytes()[4:]

    body = bytes([0]) + payload                  # end mark only
    outer = BinlogWriter(checksum="crc32")
    outer.format_description()
    stream = bytearray(outer.bytes())
    size = 19 + len(body) + 4
    pos = len(stream) - 4 + size
    ev = struct.pack("<IBIIIH", 1_710_000_000, 40, 7007, size,
                     pos, 0) + body
    stream += ev + struct.pack("<I", zlib.crc32(ev))

    got = decode_binlog(bytes(stream))
    (ins,) = [e for e in got if e.kind == "insert"]
    assert ins.rows == [[["8", "default-none"]]]


def test_transaction_payload_malformed_keeps_targeted_message():
    """A corrupt type-40 TLV area must still raise the message
    naming binlog_transaction_compression — not a bare lenenc
    parse error (the operator-spelunking outcome)."""
    import struct
    import zlib

    import pytest

    from galaxy_spark.cdc.binlog import decode_binlog
    from tests.fixtures.binlog_wire_encoder import BinlogWriter

    outer = BinlogWriter(checksum="crc32")
    outer.format_description()
    stream = bytearray(outer.bytes())
    body = b"\xfb\xff\x01\x02"                   # invalid lenenc
    size = 19 + len(body) + 4
    pos = len(stream) - 4 + size
    ev = struct.pack("<IBIIIH", 1_710_000_000, 40, 7007, size,
                     pos, 0) + body
    stream += ev + struct.pack("<I", zlib.crc32(ev))
    with pytest.raises(ValueError,
                       match="binlog_transaction_compression"):
        decode_binlog(bytes(stream))
