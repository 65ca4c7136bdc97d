"""MySQL client/replication protocol: connect as a REPLICA and
stream binlog bytes — the reference's actual source connection
(``internal/sync_server/sync.go:44-118``: go-mysql's
BinlogSyncer performs exactly this handshake, COM_REGISTER_SLAVE,
COM_BINLOG_DUMP sequence over the wire).

Everything here is the PUBLIC client/server protocol (MySQL
Internals: connection phase + replication commands), implemented
over plain bytes:

- packet framing: 3-byte little-endian length + sequence id, with
  the 0xFFFFFF continuation rule;
- HandshakeV10 parse (server version, capability flags, the
  20-byte auth scramble split across two fields);
- HandshakeResponse41 build with ``mysql_native_password`` proof:
  ``SHA1(pwd) XOR SHA1(scramble + SHA1(SHA1(pwd)))``;
- OK/ERR packet classification;
- the pre-dump command phase a 5.6+ server REQUIRES:
  ``SET @master_binlog_checksum = @@global.binlog_checksum`` (the
  dump is refused without it on a default CRC32-checksummed
  server), then COM_REGISTER_SLAVE and COM_BINLOG_DUMP (the
  reference's start position semantics: dump from a saved
  ``(file, pos)``, ``pkg/shared.go:13-14``);
- the dump's synthetic pre-FDE fake ROTATE (checksummed on a CRC32
  stream even though the FDE declaring the mode comes after it):
  decoded by CRC-sniff, never written to relay segments;
- the replication stream itself: each event arrives as one packet
  with a leading 0x00 OK byte; stripping it yields exactly the
  event bytes ``cdc/binlog.py:decode_binlog`` reads (CRC32
  trailers included — the decoder's checksum handling applies).

No MySQL server exists in this sandbox, so the integration test
(tests/test_replication_client.py) runs the full sequence against
an in-process FAKE server speaking this same public protocol over
a socketpair, serving the recorded rich fixture — the client code
path is identical to a live server's. ``tail_binlog`` accepts any
connected socket, so pointing it at a real host:3306 is the same
call.
"""

from __future__ import annotations

import hashlib
import struct

CLIENT_LONG_PASSWORD = 0x0001
CLIENT_PROTOCOL_41 = 0x0200
CLIENT_SECURE_CONNECTION = 0x8000
CLIENT_PLUGIN_AUTH = 0x80000

COM_QUERY = 0x03
COM_REGISTER_SLAVE = 0x15
COM_BINLOG_DUMP = 0x12

_MAX_CHUNK = 0xFFFFFF


# ---- packet framing -------------------------------------------------

def frame_packet(payload: bytes, seq: int) -> bytes:
    """One or more wire packets for a payload (0xFFFFFF split)."""
    out = bytearray()
    pos = 0
    while True:
        chunk = payload[pos:pos + _MAX_CHUNK]
        out += struct.pack("<I", len(chunk))[:3] + bytes([seq & 0xFF])
        out += chunk
        seq += 1
        pos += len(chunk)
        if len(chunk) < _MAX_CHUNK:
            return bytes(out)


class PacketConn:
    """Framed packet reader/writer over any socket-like object
    (needs ``recv``/``sendall``)."""

    def __init__(self, sock) -> None:
        self.sock = sock
        self._buf = b""
        self.seq = 0

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("server closed the connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def read_packet(self) -> bytes:
        """One logical payload (continuation chunks rejoined)."""
        payload = b""
        while True:
            head = self._recv_exact(4)
            n = head[0] | (head[1] << 8) | (head[2] << 16)
            self.seq = (head[3] + 1) & 0xFF
            payload += self._recv_exact(n)
            if n < _MAX_CHUNK:
                return payload

    def write_payload(self, payload: bytes, seq: int | None = None) -> None:
        s = self.seq if seq is None else seq
        self.sock.sendall(frame_packet(payload, s))
        self.seq = (s + 1) & 0xFF


# ---- connection phase -----------------------------------------------

def parse_handshake_v10(payload: bytes) -> dict:
    if payload[0] != 10:
        raise ValueError(
            f"expected HandshakeV10 (protocol 10), got {payload[0]}")
    end = payload.index(b"\x00", 1)
    server_version = payload[1:end].decode()
    p = end + 1
    thread_id = struct.unpack("<I", payload[p:p + 4])[0]
    p += 4
    scramble = payload[p:p + 8]
    p += 8 + 1                                   # filler
    cap_low = struct.unpack("<H", payload[p:p + 2])[0]
    p += 2
    charset = payload[p]
    p += 1
    status = struct.unpack("<H", payload[p:p + 2])[0]
    p += 2
    cap_high = struct.unpack("<H", payload[p:p + 2])[0]
    p += 2
    capabilities = cap_low | (cap_high << 16)
    auth_len = payload[p]
    p += 1 + 10                                  # reserved
    if capabilities & CLIENT_SECURE_CONNECTION:
        # part 2: max(13, auth_len - 8) bytes incl. trailing \0 —
        # strip exactly ONE terminator: a scramble whose last real
        # byte is 0x00 (1/256 of handshakes) must keep it, or the
        # auth proof hashes 19 bytes and auth fails
        n2 = max(13, auth_len - 8)
        part2 = payload[p:p + n2]
        if part2.endswith(b"\x00"):
            part2 = part2[:-1]
        scramble += part2
        p += n2
    plugin = None
    if capabilities & CLIENT_PLUGIN_AUTH:
        nul = payload.find(b"\x00", p)
        plugin = payload[p:nul if nul >= 0 else None].decode()
    return {"server_version": server_version, "thread_id": thread_id,
            "scramble": scramble, "capabilities": capabilities,
            "charset": charset, "status": status, "plugin": plugin}


def native_password_proof(password: str, scramble: bytes) -> bytes:
    """``mysql_native_password``: SHA1(pwd) XOR SHA1(scramble +
    SHA1(SHA1(pwd))). Empty password -> empty proof."""
    if not password:
        return b""
    h1 = hashlib.sha1(password.encode()).digest()
    h2 = hashlib.sha1(h1).digest()
    h3 = hashlib.sha1(scramble + h2).digest()
    return bytes(a ^ b for a, b in zip(h1, h3))


def build_handshake_response(user: str, password: str,
                             scramble: bytes) -> bytes:
    caps = (CLIENT_LONG_PASSWORD | CLIENT_PROTOCOL_41
            | CLIENT_SECURE_CONNECTION | CLIENT_PLUGIN_AUTH)
    proof = native_password_proof(password, scramble)
    return (struct.pack("<IIB", caps, 1 << 24, 33) + bytes(23)
            + user.encode() + b"\x00"
            + bytes([len(proof)]) + proof
            + b"mysql_native_password\x00")


def classify_response(payload: bytes) -> tuple[str, dict]:
    if payload[:1] == b"\x00":
        return "ok", {}
    if payload[:1] == b"\xff":
        code = struct.unpack("<H", payload[1:3])[0]
        msg = payload[3:].decode("utf-8", "replace")
        if msg.startswith("#"):
            msg = msg[6:]                        # sql-state marker
        return "err", {"code": code, "message": msg}
    return "other", {}


# ---- replication commands -------------------------------------------

def build_register_slave(server_id: int) -> bytes:
    """COM_REGISTER_SLAVE with empty host/user/password/port report
    fields (what go-mysql sends by default)."""
    return (bytes([COM_REGISTER_SLAVE]) + struct.pack("<I", server_id)
            + b"\x00" * 3                        # host/user/pwd lens
            + struct.pack("<HII", 0, 0, 0))      # port, rank, master


def build_binlog_dump(server_id: int, file: str, pos: int,
                      non_blocking: bool = False) -> bytes:
    """COM_BINLOG_DUMP from a saved (file, pos) — the reference's
    resume semantics. ``non_blocking`` sets BINLOG_DUMP_NON_BLOCK
    (server sends EOF instead of blocking at end of stream)."""
    flags = 0x01 if non_blocking else 0
    return (bytes([COM_BINLOG_DUMP])
            + struct.pack("<IHI", pos, flags, server_id)
            + file.encode())


# ---- the client ------------------------------------------------------

def authenticate(conn: PacketConn, user: str, password: str) -> dict:
    """Connection phase over an already-connected socket: read
    HandshakeV10, answer HandshakeResponse41, expect OK."""
    hs = parse_handshake_v10(conn.read_packet())
    if hs["plugin"] not in (None, "mysql_native_password"):
        raise ValueError(
            f"unsupported auth plugin {hs['plugin']!r} (this client "
            "implements mysql_native_password; caching_sha2_password "
            "needs TLS or an RSA exchange)")
    conn.write_payload(
        build_handshake_response(user, password, hs["scramble"]))
    kind, info = classify_response(conn.read_packet())
    if kind != "ok":
        raise ConnectionError(f"authentication failed: {info}")
    return hs


def build_query(sql: str) -> bytes:
    return bytes([COM_QUERY]) + sql.encode()


def _start_dump(conn: PacketConn, server_id: int, file: str,
                pos: int) -> None:
    """The pre-dump command phase a real 5.6+ master REQUIRES:
    ``SET @master_binlog_checksum = @@global.binlog_checksum``
    (without it a default-configured server refuses the dump with
    'Slave can not handle replication events with the checksum...'
    — the statement returns a plain OK, no resultset needed), then
    COM_REGISTER_SLAVE, then COM_BINLOG_DUMP."""
    conn.write_payload(build_query(
        "SET @master_binlog_checksum = @@global.binlog_checksum"),
        seq=0)
    kind, info = classify_response(conn.read_packet())
    if kind != "ok":
        raise ConnectionError(
            f"SET @master_binlog_checksum refused: {info}")
    conn.write_payload(build_register_slave(server_id), seq=0)
    kind, info = classify_response(conn.read_packet())
    if kind != "ok":
        raise ConnectionError(f"COM_REGISTER_SLAVE refused: {info}")
    conn.write_payload(build_binlog_dump(server_id, file, pos,
                                         non_blocking=True), seq=0)


def _rotate_next_name(ev: bytes) -> tuple[str, bool]:
    """Next-file name from a ROTATE whose checksum framing is
    UNKNOWN — the server's synthetic pre-FDE fake ROTATE arrives
    BEFORE the FDE that would declare the algorithm, and on a CRC32
    stream it IS checksummed: parsing body[8:] as the name then
    swallows the 4 CRC bytes (usually invalid UTF-8 -> crash at
    stream start). Sniff: if the last 4 bytes verify as the CRC32
    of the rest, strip them (2^-32 false-positive on a name whose
    tail happens to match). Returns (name, was_checksummed)."""
    import zlib

    if (len(ev) >= 31
            and zlib.crc32(ev[:-4]) == int.from_bytes(ev[-4:],
                                                      "little")):
        return ev[27:-4].decode(), True    # 19 header + 8 position
    return ev[27:].decode(), False


def relay_to_segments(sock, user: str, password: str, server_id: int,
                      file: str, pos: int, out_dir: str,
                      max_events: int | None = None) -> int:
    """The wire -> Spark bridge, shaped like MySQL's own relay log:
    this function is the RELAY WRITER — it speaks the replication
    protocol (authenticate, register, dump) and appends the raw
    event bytes to ``<out_dir>/<binlog name>.bin`` segment files,
    rotating files when the master rotates — and the existing
    ``galaxy_binlog`` streaming DataSource is the relay READER
    tailing those segments into micro-batches. Split this way, the
    long-lived socket lives in one connector process (exactly the
    reference's single syncer goroutine, ``sync.go:105``) while
    Spark's executors keep the pull-based (start, end] offset model
    the DataSource API wants; the event-aligned ``latestOffset``
    already tolerates catching this writer mid-append.

    Bytes land verbatim (CRC32 trailers included); each segment
    starts with the binlog magic; the stream's FDE is replicated
    into every segment so each decodes standalone; fsync at
    transaction boundaries (XID) bounds loss to the open
    transaction. Returns the number of events relayed."""
    import os

    from galaxy_spark.cdc.binlog import (FORMAT_DESCRIPTION_EVENT,
                                         MAGIC, ROTATE_EVENT,
                                         XID_EVENT, _detect_checksum)

    conn = PacketConn(sock)
    authenticate(conn, user, password)
    _start_dump(conn, server_id, file, pos)

    os.makedirs(out_dir, exist_ok=True)
    crc32_mode = False
    fde: bytes | None = None
    fh = None
    cur = file
    n = 0

    def open_segment(name: str):
        nonlocal fh
        if fh is not None:
            fh.flush()
            os.fsync(fh.fileno())
            fh.close()
        path = os.path.join(out_dir, f"{name}.bin")
        fresh = not os.path.exists(path)
        fh = open(path, "ab")
        if fresh:
            fh.write(MAGIC)
            if fde is not None:
                fh.write(fde)

    try:
        while True:
            payload = conn.read_packet()
            if payload[:1] == b"\xfe" and len(payload) < 9:
                break
            kind, info = classify_response(payload)
            if kind == "err":
                raise ConnectionError(f"binlog dump error: {info}")
            ev = payload[1:]
            etype = ev[4]
            if etype == FORMAT_DESCRIPTION_EVENT:
                crc32_mode = _detect_checksum(ev)
                fde = ev
                if fh is None:
                    open_segment(cur)    # seeds magic + this FDE
                continue                 # never written twice
            if etype == ROTATE_EVENT and fde is None:
                # the server's synthetic pre-FDE fake ROTATE: it
                # only ANNOUNCES the file the dump starts in. Real
                # relay logs don't store it, and opening a segment
                # here would beat the FDE to it (a first segment
                # with no FDE seed that cannot decode standalone) —
                # record the name and wait for the FDE.
                cur, _ = _rotate_next_name(ev)
                continue
            if fh is None:
                open_segment(cur)
            if etype == ROTATE_EVENT:
                body = ev[19:len(ev) - 4] if crc32_mode else ev[19:]
                nxt = body[8:].decode()
                fh.write(ev)             # rotate closes THIS segment
                cur = nxt
                open_segment(cur)
                continue
            fh.write(ev)
            n += 1
            if etype == XID_EVENT:       # transaction boundary
                fh.flush()
                os.fsync(fh.fileno())
            if max_events is not None and n >= max_events:
                break
    finally:
        if fh is not None:
            fh.flush()
            os.fsync(fh.fileno())
            fh.close()
    return n


def tail_binlog(sock, user: str, password: str, server_id: int,
                file: str, pos: int, max_events: int | None = None):
    """Generator over DecodedEvents from a live replication stream:
    authenticate, COM_REGISTER_SLAVE, COM_BINLOG_DUMP(file, pos),
    then yield each event packet's bytes through the byte decoder.

    Each network packet carries [0x00 OK byte][one binlog event];
    the per-connection TABLE_MAP state lives in an incremental
    decode loop exactly like the segment-file tier (the wire never
    re-sends TABLE_MAPs mid-stream, so state must persist across
    packets). ERR packets raise; EOF (0xFE short packet, sent under
    BINLOG_DUMP_NON_BLOCK) ends the stream.
    """
    from galaxy_spark.cdc.binlog import (ROTATE_EVENT, DecodedEvent,
                                         decode_binlog)

    conn = PacketConn(sock)
    authenticate(conn, user, password)
    _start_dump(conn, server_id, file, pos)

    # incremental decode: accumulate event bytes; decode_binlog is
    # re-run over the buffer so TABLE_MAP state is always in scope.
    # BOUNDED: at each transaction boundary (XID / ROTATE) the
    # buffer resets to just the stream's FDE — legal because every
    # transaction re-sends its own TABLE_MAPs before its rows
    # events, so no cross-transaction decoder state is needed; the
    # per-packet re-decode cost is O(open transaction), not
    # O(stream history).
    buf = b""
    fde_raw = b""
    n_seen = 0
    n_out = 0
    while True:
        payload = conn.read_packet()
        if payload[:1] == b"\xfe" and len(payload) < 9:
            return                               # EOF marker
        kind, info = classify_response(payload)
        if kind == "err":
            raise ConnectionError(f"binlog dump error: {info}")
        if payload[:1] != b"\x00":
            raise ValueError("unexpected packet in replication stream")
        ev_bytes = payload[1:]
        if ev_bytes[4] == ROTATE_EVENT and not fde_raw:
            # pre-FDE fake ROTATE: checksum framing unknown, so
            # decode it standalone by CRC-sniff instead of letting
            # decode_binlog (mode NONE until an FDE) read the CRC
            # bytes into the file name
            name, _ = _rotate_next_name(ev_bytes)
            ev = DecodedEvent(
                "rotate",
                int.from_bytes(ev_bytes[0:4], "little"),
                int.from_bytes(ev_bytes[13:17], "little"),
                next_file=name)
            yield ev
            n_out += 1
            if max_events is not None and n_out >= max_events:
                return
            continue
        if ev_bytes[4] == 15:                    # FORMAT_DESCRIPTION
            fde_raw = ev_bytes
        buf += ev_bytes
        events = decode_binlog(buf)
        for ev in events[n_seen:]:
            yield ev
            n_out += 1
            if max_events is not None and n_out >= max_events:
                return
        n_seen = len(events)
        if events and events[-1].kind in ("xid", "rotate"):
            buf = fde_raw                        # transaction done
            n_seen = 1 if fde_raw else 0
