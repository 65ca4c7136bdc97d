"""Builds tests/fixtures/binlog_v4_rich.bin: a CRC32-checksummed
MySQL binlog v4 stream exercising the full decoder type surface —
NEWDECIMAL (digit-exact, positive/negative/trailing-zero scales),
DATE, YEAR, INT24, DATETIME2/TIMESTAMP2/TIME2 (with and without
fractional seconds), BLOB (UTF-8 text and true binary), VARCHAR,
and the numeric core — authored by the INDEPENDENT encoder in
binlog_wire_encoder.py (see its module docstring for the
provenance/validation rationale).

Run: python tests/fixtures/make_binlog_fixture_rich.py
"""

from __future__ import annotations

import os

from binlog_wire_encoder import (BLOB, DATE, DATETIME2, DOUBLE,
                                 INT24, JSON, LONG, LONGLONG,
                                 NEWDECIMAL, TIME2, TIMESTAMP2,
                                 VARCHAR, YEAR, BinlogWriter, JDec)

TABLE_ID = 77
# (type, meta): NEWDECIMAL meta = precision | scale << 8
COLUMNS = [
    (LONGLONG, 0),                    # id
    (NEWDECIMAL, 12 | (4 << 8)),      # amount DECIMAL(12,4)
    (NEWDECIMAL, 20 | (0 << 8)),      # big_int_dec DECIMAL(20,0)
    (DATE, 0),                        # paid_on
    (DATETIME2, 4),                   # created DATETIME(4)
    (TIMESTAMP2, 0),                  # ts TIMESTAMP(0)
    (TIME2, 2),                       # dur TIME(2)
    (BLOB, 2),                        # note BLOB/TEXT
    (YEAR, 0),                        # yr
    (INT24, 0),                       # cnt MEDIUMINT
    (VARCHAR, 300),                   # label VARCHAR(300): 2-byte len
    (LONG, 0),                        # qty
    (DOUBLE, 0),                      # ratio
    (JSON, 4),                        # props JSON
]

ROW1 = [101, "12345678.9999", "99999999999999999999", "2024-02-29",
        "2024-02-29 23:59:59.1234", "2024-03-01 00:00:05", "838:59:58.99",
        b"utf8 text payload \xe2\x9c\x93", 2024, 8388607,
        "label-one", -7, 2.5,
        {"k": 1, "tags": ["a", "b"], "price": JDec("19.9900", 10, 4)}]
ROW2 = [102, "-0.0100", "0", "1970-01-01",
        "1999-12-31 00:00:00.0000", "2038-01-19 03:14:07", "-00:00:01",
        bytes([0x00, 0xFF, 0x80, 0x7F]), 0, -8388608,
        "x" * 260, None, None, None]
ROW2_V2 = [102, "-987654.3210", "0", "1970-01-01",
           "1999-12-31 00:00:00.0000", "2038-01-19 03:14:07",
           "-00:00:01", b"rewritten", 0, -8388608,
           "x" * 260, 42, 0.125,
           [1, 2.5, "three", False, {"nested": None}]]


SID = "3e11fa47000011e9b21300505690d3a0"


def build() -> bytes:
    """Realistic 5.6+ stream shape: PREVIOUS_GTIDS right after the
    FDE, a GTID before the transaction, ROWS_QUERY bookkeeping
    inside it — the events a refuse-on-unknown decoder must
    RECOGNIZE to read any real server's binlog at all."""
    w = BinlogWriter()
    w.format_description()
    w.previous_gtids(SID, 41)
    w.gtid(SID, 42)
    w.query("shop", "BEGIN")
    w.table_map(TABLE_ID, "shop", "payments", COLUMNS)
    w.rows_query("INSERT INTO payments VALUES (...)")
    w.write_rows(TABLE_ID, COLUMNS, [ROW1, ROW2])
    w.table_map(TABLE_ID, "shop", "payments", COLUMNS)
    w.update_rows(TABLE_ID, COLUMNS, [(ROW2, ROW2_V2)])
    w.table_map(TABLE_ID, "shop", "payments", COLUMNS)
    w.delete_rows(TABLE_ID, COLUMNS, [ROW1])
    w.xid(4242)
    w.gtid(SID, 43, anonymous=True)
    w.query("shop",
            "ALTER TABLE payments ADD COLUMN refunded tinyint")
    w.heartbeat("binlog.000001")
    w.rotate("binlog.000002")
    return w.bytes()


def main() -> None:
    out = os.path.join(os.path.dirname(__file__), "binlog_v4_rich.bin")
    with open(out, "wb") as f:
        f.write(build())
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
