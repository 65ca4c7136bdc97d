"""An INDEPENDENT MySQL binlog v4 wire ENCODER, written against the
public format documentation (MySQL Internals: binary log event
layouts; the packed NEWDECIMAL layout of strings/decimal.c; the
*2 temporal encodings of my_time.cc) — deliberately sharing no code
with either galaxy_spark/cdc/binlog.py (the decoder under test) or
tests/fixtures/make_binlog_fixture.py (the first, checksum-NONE
fixture author). Its purpose is validation-by-independence: this
sandbox has no MySQL server to capture real bytes from, so the next
best evidence that the decoder reads the PUBLIC layout (rather than
its own author's private convention) is bytes produced by a second
implementation, written separately, including property tests that
round-trip randomized values encoder→decoder.

Differences from the first fixture builder, on purpose:
- typed value encoders for the full supported column set
  (NEWDECIMAL, DATE, YEAR, INT24, DATETIME2, TIMESTAMP2, TIME2,
  BLOB/TEXT, VARCHAR, and the numeric core),
- binlog_checksum=CRC32: every event carries its 4-byte trailing
  CRC and the FORMAT_DESCRIPTION advertises algorithm byte 1,
- big-endian packing built on int.to_bytes (not struct format
  strings), with the bit layouts transcribed afresh from the spec.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone

DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]

# type codes (public)
TINY, SHORT, LONG, FLOAT, DOUBLE, LONGLONG = 1, 2, 3, 4, 5, 8
INT24, DATE, YEAR, VARCHAR = 9, 10, 13, 15
TIMESTAMP_V1, TIME_V1, DATETIME_V1, NEWDATE, BIT = 7, 11, 12, 14, 16
TIMESTAMP2, DATETIME2, TIME2 = 17, 18, 19
JSON = 245
NEWDECIMAL, ENUM, SET, BLOB, STRING = 246, 247, 248, 252, 254
GEOMETRY = 255


def string_meta(max_len: int) -> int:
    """CHAR's packed 2-byte STRING metadata as this module's meta
    int (m0 | m1 << 8): m0 = type byte with the upper 2 length bits
    xor-0x30-folded into bits 4-5, m1 = low length byte."""
    m0 = (STRING & ~0x30) | ((((max_len >> 8) & 3) ^ 3) << 4)
    return m0 | ((max_len & 0xFF) << 8)


def enum_meta(index_bytes: int) -> int:
    return ENUM | (index_bytes << 8)


def set_meta(mask_bytes: int) -> int:
    return SET | (mask_bytes << 8)


def le(v: int, n: int) -> bytes:
    return int(v).to_bytes(n, "little", signed=False)


def le_signed(v: int, n: int) -> bytes:
    """Two's-complement little-endian; unsigned-range values share
    the same wire bytes, so accept the full n-byte range."""
    v = int(v)
    return v.to_bytes(n, "little", signed=v < 0)


def be(v: int, n: int) -> bytes:
    return int(v).to_bytes(n, "big", signed=False)


# ---- typed column-value encoders -----------------------------------

def enc_newdecimal(text: str, precision: int, scale: int) -> bytes:
    """Digit string (e.g. '-1234.5600') -> packed decimal bytes."""
    neg = text.startswith("-")
    if neg:
        text = text[1:]
    ip, _, fp = text.partition(".")
    fp = (fp + "0" * scale)[:scale]
    intg = precision - scale
    assert len(ip.lstrip("0")) <= intg <= 9 * 4  # DECIMAL(s,s): 0 ok
    ip = ip.zfill(intg) if intg else ""
    intg0, intg_rem = divmod(intg, 9)
    frac0, frac_rem = divmod(scale, 9)
    out = bytearray()
    i = 0
    if intg_rem:
        out += be(int(ip[:intg_rem] or "0"), DIG2BYTES[intg_rem])
        i = intg_rem
    for _ in range(intg0):
        out += be(int(ip[i:i + 9]), 4)
        i += 9
    i = 0
    for _ in range(frac0):
        out += be(int(fp[i:i + 9]), 4)
        i += 9
    if frac_rem:
        out += be(int(fp[i:i + frac_rem]), DIG2BYTES[frac_rem])
    if neg:
        out = bytearray((~b) & 0xFF for b in out)
    out[0] ^= 0x80                      # sign bit lives in the MSB
    return bytes(out)


def enc_date(iso: str) -> bytes:
    y, m, d = (int(x) for x in iso.split("-"))
    return le((y << 9) | (m << 5) | d, 3)


def enc_year(v: int) -> bytes:
    return bytes([0 if v == 0 else v - 1900])


def _enc_frac(micro_text: str, fsp: int) -> bytes:
    """Fraction text -> ceil(fsp/2) big-endian bytes. MySQL stores
    the fraction scaled to 2*ceil(fsp/2) digits (the full byte
    capacity: fsp=1 stores centiseconds 0-99, fsp=3 stores 100-us
    units 0-9999), NOT to fsp digits — an odd-fsp value encoded at
    fsp digits round-trips to a 10x-off rendering."""
    n = (fsp + 1) // 2
    if n == 0:
        return b""
    return be(int((micro_text + "0" * (2 * n))[:2 * n] or "0"), n)


def enc_datetime2(iso: str, fsp: int) -> bytes:
    """'YYYY-MM-DD HH:MM:SS[.ffff]' -> 5-byte packed + fraction."""
    main, _, frac = iso.partition(".")
    dt, tm = main.split(" ")
    y, mo, d = (int(x) for x in dt.split("-"))
    h, mi, s = (int(x) for x in tm.split(":"))
    v = ((1 << 39) | ((y * 13 + mo) << 22) | (d << 17) | (h << 12)
         | (mi << 6) | s)
    return be(v, 5) + _enc_frac(frac, fsp)


def enc_timestamp2(iso_utc: str, fsp: int) -> bytes:
    main, _, frac = iso_utc.partition(".")
    secs = int(datetime.strptime(main, "%Y-%m-%d %H:%M:%S")
               .replace(tzinfo=timezone.utc).timestamp())
    return be(secs, 4) + _enc_frac(frac, fsp)


def enc_time2(text: str, fsp: int) -> bytes:
    """'[-]HH:MM:SS[.ff]' -> (3 + ceil(fsp/2))-byte biased packed
    quantity (one integer: packed time in the high 3 bytes, the
    fsp-digit fraction in the low bytes, bias at the top bit —
    negative values sit arithmetically below the bias)."""
    neg = text.startswith("-")
    if neg:
        text = text[1:]
    main, _, frac = text.partition(".")
    h, m, s = (int(x) for x in main.split(":"))
    n = (fsp + 1) // 2
    # fraction scaled to 2n digits, like _enc_frac
    fr = int((frac + "0" * (2 * n))[:2 * n] or "0") if fsp else 0
    value = (((h << 12) | (m << 6) | s) << (8 * n)) + fr
    if neg:
        value = -value
    return be((1 << (8 * (3 + n) - 1)) + value, 3 + n)


def enc_timestamp_v1(iso_utc: str) -> bytes:
    secs = int(datetime.strptime(iso_utc, "%Y-%m-%d %H:%M:%S")
               .replace(tzinfo=timezone.utc).timestamp())
    return le(secs, 4)


def enc_datetime_v1(iso: str) -> bytes:
    dt, tm = iso.split(" ")
    y, mo, d = (int(x) for x in dt.split("-"))
    h, mi, s = (int(x) for x in tm.split(":"))
    return le((y * 10000 + mo * 100 + d) * 1_000_000
              + h * 10000 + mi * 100 + s, 8)


def enc_time_v1(text: str) -> bytes:
    neg = text.startswith("-")
    if neg:
        text = text[1:]
    h, m, s = (int(x) for x in text.split(":"))
    v = h * 10000 + m * 100 + s
    if neg:
        v = (-v) & 0xFFFFFF
    return le(v, 3)


def enc_bit(value: int, nbits: int) -> bytes:
    return value.to_bytes((nbits + 7) // 8, "big")


def bit_meta(nbits: int) -> int:
    return (nbits % 8) | ((nbits // 8) << 8)


def enc_blob(payload: bytes, len_bytes: int) -> bytes:
    return le(len(payload), len_bytes) + payload


def enc_varchar(text: str, max_len: int) -> bytes:
    b = text.encode("utf-8")
    return (le(len(b), 2) if max_len > 255 else bytes([len(b)])) + b


class JDec:
    """A JSON decimal for enc_json: MySQL stores these as
    opaque-NEWDECIMAL inside the JSON binary."""

    def __init__(self, text: str, precision: int, scale: int) -> None:
        self.text, self.precision, self.scale = text, precision, scale


def _jvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        byte = n & 0x7F
        n >>= 7
        if n:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def enc_json(doc) -> bytes:
    """Python value -> MySQL JSON binary (small-container variants;
    the decoder also reads large). Ints pick the smallest signed
    width; floats are doubles; JDec becomes opaque-NEWDECIMAL."""

    def enc_value(v):
        """-> (type_byte, payload_bytes, inline_small: bool)"""
        if v is None:
            return 0x04, bytes([0]), True
        if v is True:
            return 0x04, bytes([1]), True
        if v is False:
            return 0x04, bytes([2]), True
        if isinstance(v, int):
            if -(1 << 15) <= v < (1 << 15):
                return 0x05, v.to_bytes(2, "little", signed=True), True
            if -(1 << 31) <= v < (1 << 31):
                return 0x07, v.to_bytes(4, "little", signed=True), False
            return 0x09, v.to_bytes(8, "little", signed=True), False
        if isinstance(v, float):
            import struct as _s

            return 0x0B, _s.pack("<d", v), False
        if isinstance(v, str):
            b = v.encode("utf-8")
            return 0x0C, _jvarint(len(b)) + b, False
        if isinstance(v, JDec):
            from_dec = enc_newdecimal(v.text, v.precision, v.scale)
            payload = bytes([v.precision, v.scale]) + from_dec
            return 0x0F, (bytes([NEWDECIMAL]) + _jvarint(len(payload))
                          + payload), False
        if isinstance(v, list):
            return 0x02, enc_container(None, v), False
        if isinstance(v, dict):
            return 0x00, enc_container(list(v.keys()),
                                       list(v.values())), False
        raise TypeError(f"enc_json: unsupported {type(v)}")

    def enc_container(keys, values) -> bytes:
        count = len(values)
        is_obj = keys is not None
        entry_sz = 3                        # type u8 + offset u16
        header = 4 + (count * 4 if is_obj else 0) + count * entry_sz
        key_blobs = ([k.encode("utf-8") for k in keys]
                     if is_obj else [])
        key_area = b"".join(key_blobs)
        enc = [enc_value(v) for v in values]
        # layout: header | keys | non-inlined values
        out_vals = bytearray()
        ventries = bytearray()
        base_vals = header + len(key_area)
        for t, payload, inline in enc:
            if inline:
                ventries.append(t)
                ventries += payload.ljust(2, b"\x00")
            else:
                off = base_vals + len(out_vals)
                assert off < (1 << 16), "small container overflow"
                ventries.append(t)
                ventries += off.to_bytes(2, "little")
                out_vals += payload
        kentries = bytearray()
        koff = header
        for kb in key_blobs:
            kentries += koff.to_bytes(2, "little")
            kentries += len(kb).to_bytes(2, "little")
            koff += len(kb)
        total = header + len(key_area) + len(out_vals)
        return (count.to_bytes(2, "little") + total.to_bytes(2, "little")
                + bytes(kentries) + bytes(ventries) + key_area
                + bytes(out_vals))

    t, payload, _inline = enc_value(doc)
    if t in (0x00, 0x02):
        return bytes([t]) + payload
    return bytes([t]) + payload


def encode_value(value, col_type: int, meta: int) -> bytes:
    import struct as _s

    if value is None:
        raise ValueError("NULLs ride the null bitmap, not bytes")
    if col_type == TINY:
        return le_signed(value, 1)
    if col_type == SHORT:
        return le_signed(value, 2)
    if col_type == LONG:
        return le_signed(value, 4)
    if col_type == LONGLONG:
        return le_signed(value, 8)
    if col_type == INT24:
        return le(value & 0xFFFFFF, 3)
    if col_type == FLOAT:
        return _s.pack("<f", value)
    if col_type == DOUBLE:
        return _s.pack("<d", value)
    if col_type == VARCHAR:
        return enc_varchar(value, meta)
    if col_type in (DATE, NEWDATE):
        return enc_date(value)
    if col_type == TIMESTAMP_V1:
        return enc_timestamp_v1(value)
    if col_type == DATETIME_V1:
        return enc_datetime_v1(value)
    if col_type == TIME_V1:
        return enc_time_v1(value)
    if col_type == BIT:
        return enc_bit(value, (meta >> 8) * 8 + (meta & 0xFF))
    if col_type == YEAR:
        return enc_year(value)
    if col_type == DATETIME2:
        return enc_datetime2(value, meta)
    if col_type == TIMESTAMP2:
        return enc_timestamp2(value, meta)
    if col_type == TIME2:
        return enc_time2(value, meta)
    if col_type == NEWDECIMAL:
        return enc_newdecimal(value, meta & 0xFF, meta >> 8)
    if col_type == BLOB:
        return enc_blob(value, meta)
    if col_type == STRING:
        m0, m1 = meta & 0xFF, meta >> 8
        if m0 in (ENUM, SET):
            return le(value, m1)           # index / bitmask
        max_len = ((((m0 >> 4) & 3) ^ 3) << 8) | m1
        b = value.encode("utf-8")
        return (le(len(b), 2) if max_len > 255 else bytes([len(b)])) + b
    if col_type == JSON:
        doc = enc_json(value)
        return le(len(doc), meta) + doc
    if col_type == GEOMETRY:
        srid, wkb = value                 # (srid, raw WKB bytes)
        payload = le(srid, 4) + wkb
        return le(len(payload), meta) + payload
    raise ValueError(f"no encoder for column type {col_type}")


def meta_bytes(col_type: int, meta: int) -> bytes:
    """The TABLE_MAP per-column metadata encoding for a type."""
    if col_type in (TINY, SHORT, LONG, LONGLONG, INT24, DATE, YEAR,
                    TIMESTAMP_V1, TIME_V1, DATETIME_V1, NEWDATE):
        return b""
    if col_type == BIT:
        return bytes([meta & 0xFF, meta >> 8])     # bits%8, bytes
    if col_type in (FLOAT, DOUBLE):
        return bytes([8 if col_type == DOUBLE else 4])
    if col_type == VARCHAR:
        return le(meta, 2)
    if col_type in (TIMESTAMP2, DATETIME2, TIME2):
        return bytes([meta])                       # fsp
    if col_type == NEWDECIMAL:
        return bytes([meta & 0xFF, meta >> 8])     # precision, scale
    if col_type == BLOB:
        return bytes([meta])                       # length-byte count
    if col_type == JSON:
        return bytes([meta])                       # length-byte count
    if col_type == GEOMETRY:
        return bytes([meta])                       # length-byte count
    if col_type == STRING:
        return bytes([meta & 0xFF, meta >> 8])     # [m0, m1] packed
    raise ValueError(f"no metadata rule for column type {col_type}")


# ---- event assembly -------------------------------------------------

class BinlogWriter:
    """Assembles a binlog v4 stream — CRC32-checksummed by default;
    ``checksum="none"`` produces an algorithm-0 stream (events carry
    no trailer and the FDE advertises byte 0), the shape a server
    writes after ``SET GLOBAL binlog_checksum=NONE``."""

    MAGIC = bytes.fromhex("fe62696e")

    def __init__(self, server_id: int = 7007,
                 base_ts: int = 1_710_000_000,
                 checksum: str = "crc32") -> None:
        self.server_id = server_id
        self.ts = base_ts
        self.out = bytearray(self.MAGIC)
        self.pos = len(self.MAGIC)
        self.crc32 = checksum == "crc32"

    def _emit(self, etype: int, body: bytes,
              server_id: int | None = None) -> None:
        size = 19 + len(body) + (4 if self.crc32 else 0)
        self.pos += size
        sid = self.server_id if server_id is None else server_id
        header = (le(self.ts, 4) + bytes([etype]) + le(sid, 4)
                  + le(size, 4) + le(self.pos, 4) + le(0, 2))
        ev = header + body
        self._last_body = body          # for body-level decode tests
        self.out += ev + (le(zlib.crc32(ev), 4) if self.crc32 else b"")

    def last_body(self) -> bytes:
        """The most recently emitted event's BODY (no header, no
        CRC trailer) — what a checksum-trimming decoder sees."""
        return self._last_body

    def format_description(self) -> None:
        body = (le(4, 2) + b"8.4.0-indep-fixture".ljust(50, b"\x00")
                + le(self.ts, 4) + bytes([19])
                + bytes(39)                        # post-header lengths
                + bytes([1 if self.crc32 else 0])) # algorithm byte
        self._emit(15, body)

    def query(self, db: str, sql: str) -> None:
        d = db.encode()
        body = (le(11, 4) + le(0, 4) + bytes([len(d)]) + le(0, 2)
                + le(0, 2) + d + b"\x00" + sql.encode())
        self._emit(2, body)

    #: types counted by the SIGNEDNESS bitmap (numeric field order)
    NUMERIC_TYPES = frozenset({1, 2, 3, 4, 5, 8, 9, 13, 246})

    def table_map(self, table_id: int, db: str, table: str,
                  columns: list, unsigned: list | None = None) -> None:
        d, t = db.encode(), table.encode()
        metas = b"".join(meta_bytes(ct, m) for ct, m in columns)
        body = (le(table_id, 6) + le(0, 2)
                + bytes([len(d)]) + d + b"\x00"
                + bytes([len(t)]) + t + b"\x00"
                + bytes([len(columns)])
                + bytes(ct for ct, _ in columns)
                + bytes([len(metas)]) + metas
                + self._bitmap(list(range(len(columns))),
                               len(columns)))      # all nullable
        if unsigned is not None:
            # 8.0 optional metadata: SIGNEDNESS TLV — one bit per
            # NUMERIC column in field order, MSB-first
            bits = bytearray((sum(1 for ct, _ in columns
                                  if ct in self.NUMERIC_TYPES) + 7) // 8)
            j = 0
            for i, (ct, _) in enumerate(columns):
                if ct in self.NUMERIC_TYPES:
                    if unsigned[i]:
                        bits[j // 8] |= 1 << (7 - j % 8)
                    j += 1
            body += bytes([1, len(bits)]) + bytes(bits)
        self._emit(19, body)

    @staticmethod
    def _bitmap(set_bits: list, n: int) -> bytes:
        bm = bytearray((n + 7) // 8)
        for i in set_bits:
            bm[i // 8] |= 1 << (i % 8)
        return bytes(bm)

    def _row_image(self, columns: list, row: list) -> bytes:
        nulls = [i for i, v in enumerate(row) if v is None]
        out = bytearray(self._bitmap(nulls, len(columns)))
        for (ct, meta), v in zip(columns, row):
            if v is not None:
                out += encode_value(v, ct, meta)
        return bytes(out)

    def _rows(self, etype: int, table_id: int, columns: list,
              images: list) -> None:
        n = len(columns)
        body = bytearray(le(table_id, 6) + le(0, 2) + le(2, 2)
                         + bytes([n]))
        body += self._bitmap(list(range(n)), n)    # present bitmap 1
        if etype == 31:                            # UPDATE: bitmap 2
            body += self._bitmap(list(range(n)), n)
        for img in images:
            body += img
        self._emit(etype, bytes(body))

    def write_rows(self, table_id: int, columns: list,
                   rows: list) -> None:
        self._rows(30, table_id, columns,
                   [self._row_image(columns, r) for r in rows])

    def update_rows(self, table_id: int, columns: list,
                    pairs: list) -> None:
        imgs = []
        for before, after in pairs:
            imgs.append(self._row_image(columns, before)
                        + self._row_image(columns, after))
        self._rows(31, table_id, columns, imgs)

    def delete_rows(self, table_id: int, columns: list,
                    rows: list) -> None:
        self._rows(32, table_id, columns,
                   [self._row_image(columns, r) for r in rows])

    def xid(self, txid: int) -> None:
        self._emit(16, le(txid, 8))

    def gtid(self, sid_hex: str, gno: int,
             anonymous: bool = False) -> None:
        body = (bytes([1]) + bytes.fromhex(sid_hex) + le(gno, 8)
                + bytes([2]) + le(0, 8) + le(0, 8))  # lt-type + ts
        self._emit(34 if anonymous else 33, body)

    def tagged_gtid(self, sid_hex: str | None = None,
                    gno: int | None = None, tag: str = "",
                    payload: bytes | None = None) -> None:
        """MySQL >= 8.3 GTID_TAGGED_EVENT (42, WL#15294). With
        ``sid_hex``/``gno`` this writes a REAL
        mysql::serialization body (this encoder is written here
        independently of the production decoder, from the same
        public format description: leading format-version varint,
        then (field-id varint, value) pairs; varints put the
        extra-byte count as trailing 1-bits of the first byte;
        signed fields zigzag; strings length-prefixed; the
        optional fields 7/10/11 are omitted, exercising the
        reader's id-skip). Without them: the legacy opaque
        stand-in an r11-era reader refuses — kept as the
        conservative-fallback fixture."""
        if payload is None and sid_hex is None:
            payload = b"\x02\x01\x00"
        if payload is None:
            def vu(v: int) -> bytes:      # unsigned varint
                n = 1
                while n <= 8 and v >= (1 << (7 * n)):
                    n += 1
                if n > 8:
                    return b"\xff" + v.to_bytes(8, "little")
                return ((v << n) | ((1 << (n - 1)) - 1)) \
                    .to_bytes(n, "little")

            def vs(v: int) -> bytes:      # signed (zigzag) varint
                return vu((v << 1) ^ (v >> 63) if v < 0 else v << 1)

            t = tag.encode()
            payload = (
                vu(1)                                 # format version
                + vu(0) + bytes([0])                  # gtid_flags
                + vu(1) + bytes.fromhex(sid_hex)      # uuid
                + vu(2) + vs(gno)                     # gno
                + vu(3) + vu(len(t)) + t              # tag
                + vu(4) + vs(0)                       # last_committed
                + vu(5) + vs(1)                       # sequence_number
                + vu(6) + vu(1_700_000_000_000_000)   # immediate_ts
                + vu(8) + vu(0)                       # txn_length
                + vu(9) + vu(80300))                  # server_version
        self._emit(42, payload)

    def previous_gtids(self, sid_hex: str, upto: int) -> None:
        # gtid-set: n_sids u64, sid 16, n_intervals u64, [start, stop)
        body = (le(1, 8) + bytes.fromhex(sid_hex) + le(1, 8)
                + le(1, 8) + le(upto, 8))
        self._emit(35, body)

    def rows_query(self, sql: str) -> None:
        q = sql.encode()
        self._emit(29, bytes([min(len(q), 255)]) + q)

    # -- MariaDB flavor events (types 160-163) ----------------------
    def mariadb_gtid(self, domain: int, seq: int,
                     server_id: int | None = None,
                     standalone: bool = False) -> None:
        """MariaDB GTID (162): u64 seq, u32 domain, u8 flags2. The
        GTID's server_id rides the event HEADER. FL_STANDALONE
        (0x01) marks DDL/non-transactional statements; without it
        the event opens a transaction group (implicit BEGIN)."""
        body = le(seq, 8) + le(domain, 4) + bytes(
            [0x01 if standalone else 0x00])
        self._emit(162, body, server_id=server_id)

    def mariadb_gtid_list(self, gtids: list) -> None:
        """MariaDB GTID_LIST (163): u32 count (low 28 bits), then
        count x (u32 domain, u32 server_id, u64 seq) — the
        PREVIOUS_GTIDS analog declaring binlog state at segment
        start. ``gtids``: [(domain, server_id, seq), ...]."""
        body = bytearray(le(len(gtids) & 0x0FFFFFFF, 4))
        for d, s, q in gtids:
            body += le(d, 4) + le(s, 4) + le(q, 8)
        self._emit(163, bytes(body))

    def mariadb_annotate_rows(self, sql: str) -> None:
        """MariaDB ANNOTATE_ROWS (160): the body IS the SQL."""
        self._emit(160, sql.encode())

    def mariadb_binlog_checkpoint(self, fname: str) -> None:
        """MariaDB BINLOG_CHECKPOINT (161): u32 len + name."""
        f = fname.encode()
        self._emit(161, le(len(f), 4) + f)

    def heartbeat(self, fname: str) -> None:
        self._emit(27, fname.encode())

    def stop(self) -> None:
        self._emit(3, b"")

    def rotate(self, next_file: str) -> None:
        self._emit(4, le(4, 8) + next_file.encode())

    def bytes(self) -> bytes:
        return bytes(self.out)

    def previous_gtids_tagged(self, sid_hex: str, tag: str,
                              upto: int) -> None:
        """PREVIOUS_GTIDS carrying one TAGGED interval (MySQL >=
        8.3, WL#15294 layout): n_sids field = n*8+1, per-tsid
        1-byte-length tag block — written independently of
        GtidSet.encode so decode is tested against fixture bytes."""
        body = (le(9, 8) + bytes.fromhex(sid_hex)
                + bytes([len(tag)]) + tag.encode()
                + le(1, 8) + le(1, 8) + le(upto, 8))
        self._emit(35, body)
