"""The MySQL replication-protocol client (connection phase +
COM_REGISTER_SLAVE + COM_BINLOG_DUMP) driven against an IN-PROCESS
fake server speaking the same public wire protocol over a
socketpair — no MySQL exists in this sandbox, so the fake server
(authored here, independently of the client module) verifies the
client's bytes server-side: the mysql_native_password proof is
CHECKED against the known password, commands are parsed as a real
server would, and the replication stream serves the recorded rich
fixture's CRC32 events packet-by-packet. Pointing the same
``tail_binlog`` call at a real host:3306 is the identical code
path (reference: go-mysql's BinlogSyncer does exactly this,
``internal/sync_server/sync.go:44-118``)."""

from __future__ import annotations

import hashlib
import os
import socket
import struct
import threading

import pytest

from galaxy_spark.cdc.binlog import decode_binlog
from galaxy_spark.cdc import replication_client as rc

RICH = os.path.join(os.path.dirname(__file__), "fixtures",
                    "binlog_v4_rich.bin")
SCRAMBLE = bytes(range(1, 21))                  # 20-byte nonce
USER, PASSWORD = "repl", "s3cret"


def _fake_rotate(name: str) -> bytes:
    """The dump thread's synthetic pre-FDE ROTATE: timestamp 0,
    log_pos 0, body = position u64 + file name — CHECKSUMMED
    (CRC32 stream), because the real server checksums it even
    though the FDE declaring the mode hasn't been sent yet."""
    import zlib

    body = struct.pack("<Q", 4) + name.encode()
    ev = (struct.pack("<IBIIIH", 0, 4, 99, 19 + len(body) + 4, 0,
                      0x20) + body)
    return ev + struct.pack("<I", zlib.crc32(ev))


def _events_bytes() -> list[bytes]:
    """The fixture split into raw per-event byte strings."""
    with open(RICH, "rb") as f:
        blob = f.read()[4:]                     # strip magic
    out, off = [], 0
    while off < len(blob):
        size = struct.unpack("<I", blob[off + 9:off + 13])[0]
        out.append(blob[off:off + size])
        off += size
    return out


class FakeMaster(threading.Thread):
    """Minimal server side of the public protocol; records what it
    verified so the test can assert on it."""

    def __init__(self, sock, password=PASSWORD, start_from=0):
        super().__init__(daemon=True)
        self.sock = sock
        self.password = password
        self.start_from = start_from
        self.seen: dict = {}
        self.error: Exception | None = None

    def _send(self, payload: bytes, seq: int) -> None:
        self.sock.sendall(rc.frame_packet(payload, seq))

    def _read(self) -> tuple[int, bytes]:
        head = b""
        while len(head) < 4:
            head += self.sock.recv(4 - len(head))
        n = head[0] | (head[1] << 8) | (head[2] << 16)
        payload = b""
        while len(payload) < n:
            payload += self.sock.recv(n - len(payload))
        return head[3], payload

    def run(self) -> None:
        try:
            self._run()
        except Exception as exc:            # surfaced by the test
            self.error = exc

    def _run(self) -> None:
        # HandshakeV10: ver, thread id, scramble 8 + filler + caps,
        # charset, status, caps hi, auth len, reserved, scramble 12+\0
        hs = (bytes([10]) + b"8.4.0-fake\x00"
              + struct.pack("<I", 99) + SCRAMBLE[:8] + b"\x00"
              + struct.pack("<H", (rc.CLIENT_SECURE_CONNECTION
                                   | rc.CLIENT_PROTOCOL_41) & 0xFFFF)
              + bytes([33]) + struct.pack("<H", 2)
              + struct.pack("<H", (rc.CLIENT_PLUGIN_AUTH) >> 16)
              + bytes([21]) + bytes(10)
              + SCRAMBLE[8:] + b"\x00"
              + b"mysql_native_password\x00")
        self._send(hs, 0)
        _seq, resp = self._read()
        # parse HandshakeResponse41: caps u32, maxp u32, charset,
        # 23 zero, user\0, len-prefixed auth, plugin\0
        p = 32
        nul = resp.index(b"\x00", p)
        self.seen["user"] = resp[p:nul].decode()
        p = nul + 1
        n = resp[p]
        proof = resp[p + 1:p + 1 + n]
        h1 = hashlib.sha1(self.password.encode()).digest()
        h2 = hashlib.sha1(h1).digest()
        want = bytes(a ^ b for a, b in zip(
            h1, hashlib.sha1(SCRAMBLE + h2).digest()))
        self.seen["auth_ok"] = proof == want
        if not self.seen["auth_ok"]:
            self._send(b"\xff" + struct.pack("<H", 1045)
                       + b"#28000Access denied", 2)
            return
        self._send(b"\x00\x00\x00\x02\x00\x00\x00", 2)   # OK

        # a 5.6+ master REQUIRES the replica to declare checksum
        # support before the dump; verify the client sends it
        _seq, cmd = self._read()
        assert cmd[0] == rc.COM_QUERY
        self.seen["set_checksum"] = cmd[1:].decode()
        assert "master_binlog_checksum" in self.seen["set_checksum"]
        self._send(b"\x00\x00\x00\x02\x00\x00\x00", 1)

        _seq, cmd = self._read()
        assert cmd[0] == rc.COM_REGISTER_SLAVE
        self.seen["server_id"] = struct.unpack("<I", cmd[1:5])[0]
        self._send(b"\x00\x00\x00\x02\x00\x00\x00", 1)

        _seq, cmd = self._read()
        assert cmd[0] == rc.COM_BINLOG_DUMP
        pos, flags, sid = struct.unpack("<IHI", cmd[1:11])
        self.seen["dump"] = (pos, flags, sid, cmd[11:].decode())
        events = _events_bytes()
        seq = 1
        # a real dump thread FIRST sends a synthetic checksummed
        # fake ROTATE announcing the requested file — before the
        # FDE that would declare the checksum mode
        self._send(b"\x00" + _fake_rotate(cmd[11:].decode()), seq)
        seq += 1
        for ev in events:
            # event START offset = header log_pos (END) - size;
            # fixture log_pos values are magic-inclusive already
            off = struct.unpack("<I", ev[13:17])[0] - len(ev)
            # a real master streams the FDE first, then events at or
            # past the requested position
            if ev[4] == 15 or off >= self.start_from:
                self._send(b"\x00" + ev, seq)
                seq += 1
        self._send(b"\xfe\x00\x00\x02\x00", seq)          # EOF
        self.sock.close()


def _pair():
    a, b = socket.socketpair()
    return a, b


def test_full_replication_handshake_and_stream():
    client_sock, server_sock = _pair()
    master = FakeMaster(server_sock)
    master.start()
    got = list(rc.tail_binlog(client_sock, USER, PASSWORD,
                              server_id=4321,
                              file="binlog.000001", pos=4))
    master.join(timeout=10)
    assert master.error is None
    assert master.seen["user"] == USER and master.seen["auth_ok"]
    assert master.seen["server_id"] == 4321
    assert master.seen["dump"] == (4, 1, 4321, "binlog.000001")
    with open(RICH, "rb") as f:
        want = decode_binlog(f.read())
    # the dump leads with the synthetic checksummed fake ROTATE
    # announcing the requested file (decoded by CRC-sniff — the
    # FDE that declares the mode hasn't arrived yet)
    assert got[0].kind == "rotate" and got[0].log_pos == 0
    assert got[0].next_file == "binlog.000001"
    assert [(e.kind, e.log_pos) for e in got[1:]] == \
        [(e.kind, e.log_pos) for e in want]
    upd = [e for e in got if e.kind == "update"]
    assert upd and upd[0].rows[0][1][1] == "-987654.3210"
    assert "master_binlog_checksum" in master.seen["set_checksum"]


def test_resume_from_position_streams_suffix_only():
    """COM_BINLOG_DUMP from a later (file, pos): the fake master
    serves the FDE plus events at/past pos (a real master's
    behavior); the client decodes the suffix — including rows
    events, because each transaction re-sends its TABLE_MAP."""
    with open(RICH, "rb") as f:
        whole = decode_binlog(f.read())
    update_pos = next(e.log_pos for e in whole if e.kind == "insert")

    client_sock, server_sock = _pair()
    master = FakeMaster(server_sock, start_from=update_pos)
    master.start()
    got = list(rc.tail_binlog(client_sock, USER, PASSWORD,
                              server_id=7, file="binlog.000001",
                              pos=update_pos))
    master.join(timeout=10)
    assert master.error is None
    kinds = [e.kind for e in got]
    assert "insert" not in kinds and "update" in kinds \
        and "delete" in kinds
    assert kinds[:2] == ["rotate", "format_description"]


def test_wrong_password_is_refused():
    client_sock, server_sock = _pair()
    master = FakeMaster(server_sock)
    master.start()
    with pytest.raises(ConnectionError, match="authentication failed"):
        list(rc.tail_binlog(client_sock, USER, "wrong", server_id=1,
                            file="binlog.000001", pos=4))
    master.join(timeout=10)


def test_tail_decode_buffer_bounded_by_transaction(monkeypatch):
    """The incremental decode must reset at transaction boundaries:
    over a stream of MANY transactions the bytes re-decoded per
    packet stay O(open transaction), never O(stream history) — the
    difference between a relay that runs for a day and one that
    quadratically eats itself."""
    import galaxy_spark.cdc.binlog as B

    events = _events_bytes()
    fde = next(e for e in events if e[4] == 15)
    txn = [e for e in events
           if e[4] in (19, 29, 30, 31, 32, 16, 33)]   # one txn block

    class _ScriptedMaster(FakeMaster):
        def _run(self):
            # same pre-dump phases as the parent, scripted dump
            self._handshake_and_commands()
            seq = 1
            self._send(b"\x00" + fde, seq)
            seq += 1
            for _ in range(30):                      # 30 transactions
                for ev in txn:
                    self._send(b"\x00" + ev, seq)
                    seq += 1
            self._send(b"\xfe\x00\x00\x02\x00", seq)
            self.sock.close()

        def _handshake_and_commands(self):
            # replicate the parent's pre-dump phases
            import hashlib as _h
            hs = (bytes([10]) + b"8.4.0-fake\x00"
                  + struct.pack("<I", 99) + SCRAMBLE[:8] + b"\x00"
                  + struct.pack("<H", (rc.CLIENT_SECURE_CONNECTION
                                       | rc.CLIENT_PROTOCOL_41)
                                & 0xFFFF)
                  + bytes([33]) + struct.pack("<H", 2)
                  + struct.pack("<H", rc.CLIENT_PLUGIN_AUTH >> 16)
                  + bytes([21]) + bytes(10)
                  + SCRAMBLE[8:] + b"\x00"
                  + b"mysql_native_password\x00")
            self._send(hs, 0)
            self._read()
            self._send(b"\x00\x00\x00\x02\x00\x00\x00", 2)
            self._read()                           # SET checksum
            self._send(b"\x00\x00\x00\x02\x00\x00\x00", 1)
            self._read()                           # REGISTER_SLAVE
            self._send(b"\x00\x00\x00\x02\x00\x00\x00", 1)
            self._read()                           # BINLOG_DUMP

    max_decoded = []
    real = B.decode_binlog

    def spy(blob):
        max_decoded.append(len(blob))
        return real(blob)

    monkeypatch.setattr(B, "decode_binlog", spy)
    client_sock, server_sock = _pair()
    master = _ScriptedMaster(server_sock)
    master.start()
    got = list(rc.tail_binlog(client_sock, USER, PASSWORD,
                              server_id=2, file="binlog.000001",
                              pos=4))
    master.join(timeout=10)
    assert master.error is None
    assert sum(1 for e in got if e.kind == "xid") == 30
    txn_bytes = len(fde) + sum(len(e) for e in txn)
    assert max(max_decoded) <= txn_bytes + len(fde)
    assert len([e for e in got if e.kind == "insert"]) == 30


def test_relay_writer_feeds_galaxy_binlog_source(spark, tmp_path):
    """The complete wire -> Spark path, MySQL's own relay-log
    shape: the replication client RELAYS raw event bytes from the
    (fake) master into segment files — rotating on ROTATE, seeding
    each segment with the stream's FDE so it decodes standalone —
    and the galaxy_binlog streaming DataSource tails those segments
    into micro-batches. Row payloads must equal the fixture's
    decode, digit-exact decimals included."""
    from galaxy_spark.sources.binlog_source import BinlogDataSource

    client_sock, server_sock = _pair()
    master = FakeMaster(server_sock)
    master.start()
    relay_dir = str(tmp_path / "relay")
    n = rc.relay_to_segments(client_sock, USER, PASSWORD,
                             server_id=11, file="binlog.000001",
                             pos=4, out_dir=relay_dir)
    master.join(timeout=10)
    assert master.error is None and n > 0
    segs = sorted(os.listdir(relay_dir))
    # rotate created the follow-on segment (magic + FDE seed)
    assert segs == ["binlog.000001.bin", "binlog.000002.bin"]
    with open(os.path.join(relay_dir, "binlog.000002.bin"),
              "rb") as f:
        seeded = decode_binlog(f.read())
    assert [e.kind for e in seeded] == ["format_description"]

    try:
        spark.dataSource.register(BinlogDataSource)
    except Exception:
        pass
    q = (spark.readStream.format("galaxy_binlog")
         .option("path", relay_dir).load()
         .writeStream.format("memory").queryName("relay_rows")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM relay_rows").collect()
    with open(RICH, "rb") as f:
        want = [e for e in decode_binlog(f.read())
                if e.kind in ("insert", "update", "delete")]
    assert len(rows) == sum(len(e.rows) for e in want) == 4
    (upd,) = [r for r in rows if r.action == "update"]
    assert upd.org_row[1][1] == "-987654.3210"   # after.amount exact


def test_packet_framing_roundtrip_including_16mb_rule():
    """0xFFFFFF continuation: a payload of exactly the chunk limit
    is followed by an empty terminator packet, and big payloads
    rejoin losslessly."""
    for n in (0, 1, 0xFFFFFF - 1, 0xFFFFFF, 0xFFFFFF + 5):
        payload = bytes(i & 0xFF for i in range(n))
        framed = rc.frame_packet(payload, 0)

        class _FakeSock:
            def __init__(self, data):
                self.data = data

            def recv(self, n):
                out, self.data = self.data[:n], self.data[n:]
                return out

        conn = rc.PacketConn(_FakeSock(framed))
        assert conn.read_packet() == payload
