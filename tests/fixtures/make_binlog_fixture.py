"""Builds tests/fixtures/binlog_v4_sample.bin: a MySQL binlog v4
byte stream authored field-by-field to the PUBLIC wire layout (the
MySQL Internals manual's binary-log event formats), with
binlog_checksum=NONE (no CRC32 suffix).

Provenance note for auditors: this sandbox has no MySQL server, so
the bytes are CONSTRUCTED to the published spec rather than
captured from a live replica — every offset below is commented with
the field it encodes so the layout can be checked against the
public documentation independently of the decoder in
galaxy_spark/cdc/binlog.py (which shares no code with this
builder; it reads, this writes).

Stream contents (one committed transaction + a DDL + a rotate):
  FORMAT_DESCRIPTION(v4) -> QUERY("BEGIN") -> TABLE_MAP(shop.orders:
  LONGLONG id, LONG qty, DOUBLE amount, VARCHAR(40) note) ->
  WRITE_ROWS v2 (2 rows) -> UPDATE_ROWS v2 (1 before/after pair) ->
  DELETE_ROWS v2 (1 row, NULL note) -> XID -> QUERY(ALTER ...) ->
  ROTATE(next file)

Run: python tests/fixtures/make_binlog_fixture.py
"""

from __future__ import annotations

import os
import struct

SERVER_ID = 1001
TS = 1_700_000_000  # fixed so the fixture is deterministic


class Stream:
    def __init__(self) -> None:
        self.chunks = [b"\xfebin"]  # 4-byte magic
        self.pos = 4

    def event(self, etype: int, body: bytes, ts: int = TS) -> None:
        size = 19 + len(body)
        self.pos += size
        # common header v4: ts u32, type u8, server_id u32,
        # event_size u32, log_pos u32 (END of this event), flags u16
        self.chunks.append(struct.pack(
            "<IBIIIH", ts, etype, SERVER_ID, size, self.pos, 0) + body)

    def bytes(self) -> bytes:
        return b"".join(self.chunks)


def lenenc(n: int) -> bytes:
    assert n < 0xFB
    return bytes([n])


def fde_body() -> bytes:
    # binlog_version u16 = 4; server_version char[50] (\0-padded);
    # create_timestamp u32; header_length u8 = 19;
    # post-header-length array (one byte per event type; 40 zeroes
    # is enough for the types used here — lengths are advisory)
    ver = b"8.0.99-fixture".ljust(50, b"\x00")
    return struct.pack("<H", 4) + ver + struct.pack("<IB", TS, 19) \
        + b"\x00" * 40


def query_body(db: str, sql: str) -> bytes:
    d, q = db.encode(), sql.encode()
    # thread_id u32, exec_time u32, db_len u8, error_code u16,
    # status_vars_len u16 (0), db + \0, query (no trailing \0)
    return struct.pack("<IIBHH", 7, 0, len(d), 0, 0) + d + b"\x00" + q


TABLE_ID = 42
# column types: LONGLONG(8), LONG(3), DOUBLE(5), VARCHAR(15)
COL_TYPES = bytes([8, 3, 5, 15])
# per-type metadata: none, none, pack-size u8 (8), max-length u16 (40)
COL_META = bytes([8]) + struct.pack("<H", 40)


def table_map_body() -> bytes:
    db, tbl = b"shop", b"orders"
    return (struct.pack("<IH", TABLE_ID, 0) + struct.pack("<H", 0)
            # ^ table_id u48 (u32+u16 LE), then flags u16
            + bytes([len(db)]) + db + b"\x00"
            + bytes([len(tbl)]) + tbl + b"\x00"
            + lenenc(4) + COL_TYPES
            + lenenc(len(COL_META)) + COL_META
            + b"\x0f")  # nullability bitmap: all 4 nullable


def row_image(id_: int, qty: int, amount: float,
              note: str | None) -> bytes:
    # null bitmap over the 4 present columns (bit i = column i null)
    null_bits = 0b1000 if note is None else 0
    out = bytes([null_bits])
    out += struct.pack("<q", id_) + struct.pack("<i", qty)
    out += struct.pack("<d", amount)
    if note is not None:
        n = note.encode()
        out += bytes([len(n)]) + n  # 1-byte length: max_len 40 < 256
    return out


def rows_body(images: list[bytes], n_bitmaps: int = 1) -> bytes:
    # table_id u48, flags u16, extra_data_len u16 (=2: just itself),
    # column count lenenc, columns-present bitmap(s) (all 4 present)
    head = struct.pack("<IH", TABLE_ID, 0) + struct.pack("<HH", 0, 2)
    head += lenenc(4) + b"\x0f" * n_bitmaps
    return head + b"".join(images)


def main() -> None:
    s = Stream()
    s.event(15, fde_body())
    s.event(2, query_body("shop", "BEGIN"))
    s.event(19, table_map_body())
    s.event(30, rows_body([row_image(1, 3, 19.5, "first"),
                           row_image(2, 1, 5.25, "second")]))
    s.event(31, rows_body([row_image(2, 1, 5.25, "second")      # before
                           + row_image(2, 4, 21.0, "restocked")  # after
                           ], n_bitmaps=2))
    s.event(32, rows_body([row_image(1, 3, 19.5, None)]))
    s.event(16, struct.pack("<Q", 77))  # XID: commit id u64
    s.event(2, query_body(
        "shop", "ALTER TABLE orders ADD COLUMN coupon varchar(16)"))
    s.event(4, struct.pack("<Q", 4) + b"binlog.000002")  # ROTATE
    out = os.path.join(os.path.dirname(__file__),
                       "binlog_v4_sample.bin")
    with open(out, "wb") as f:
        f.write(s.bytes())
    print(f"wrote {out} ({len(s.bytes())} bytes)")


if __name__ == "__main__":
    main()
