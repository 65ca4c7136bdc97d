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
- HandshakeResponse41 build with the server-announced plugin's
  proof: ``mysql_native_password`` (``SHA1(pwd) XOR SHA1(scramble +
  SHA1(SHA1(pwd)))``) or ``caching_sha2_password``'s scramble
  (``SHA256(pwd) XOR SHA256(SHA256(SHA256(pwd)) + scramble)`` —
  the FAST path, accepted when the server has the user's cached
  entry; FULL auth completes over TLS via the protocol's SSLRequest
  upgrade + cleartext-password frame when ``ssl_context`` is given,
  or over PLAINTEXT via the RSA envelope — public-key request,
  pure-stdlib PEM/DER parse, RSA-OAEP(SHA-1) of the scramble-XORed
  password — so the full auth matrix is covered, see
  ``authenticate``);
- AuthSwitchRequest (0xFE) handling: an 8.0 server whose user is
  configured for a different plugin than the client offered asks
  for a re-proof against a FRESH scramble — both supported plugins
  answer the switch;
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
import re
import struct

CLIENT_LONG_PASSWORD = 0x0001
CLIENT_PROTOCOL_41 = 0x0200
CLIENT_SSL = 0x0800
CLIENT_SECURE_CONNECTION = 0x8000
CLIENT_PLUGIN_AUTH = 0x80000

COM_QUERY = 0x03
COM_REGISTER_SLAVE = 0x15
COM_BINLOG_DUMP = 0x12
COM_BINLOG_DUMP_GTID = 0x1E

#: COM_BINLOG_DUMP_GTID flags (public protocol constants)
BINLOG_DUMP_NON_BLOCK = 0x01
BINLOG_THROUGH_GTID = 0x04

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


def sha2_password_proof(password: str, scramble: bytes) -> bytes:
    """``caching_sha2_password`` fast-path scramble proof:
    XOR(SHA256(pwd), SHA256(SHA256(SHA256(pwd)) + scramble)).
    Pure hashlib — no TLS/RSA needed; the server accepts it when it
    holds the user's cached credential entry. Empty password ->
    empty proof."""
    if not password:
        return b""
    h1 = hashlib.sha256(password.encode()).digest()
    h2 = hashlib.sha256(h1).digest()
    h3 = hashlib.sha256(h2 + scramble).digest()
    return bytes(a ^ b for a, b in zip(h1, h3))


_PLUGIN_PROOFS = {
    "mysql_native_password": native_password_proof,
    "caching_sha2_password": sha2_password_proof,
}


def build_handshake_response(user: str, password: str, scramble: bytes,
                             plugin: str = "mysql_native_password",
                             ssl_active: bool = False) -> bytes:
    proof = _PLUGIN_PROOFS[plugin](password, scramble)
    caps = (CLIENT_LONG_PASSWORD | CLIENT_PROTOCOL_41
            | CLIENT_SECURE_CONNECTION | CLIENT_PLUGIN_AUTH
            | (CLIENT_SSL if ssl_active else 0))
    return (struct.pack("<IIB", caps, 1 << 24, 33) + bytes(23)
            + user.encode() + b"\x00"
            + bytes([len(proof)]) + proof
            + plugin.encode() + b"\x00")


def build_ssl_request() -> bytes:
    """SSLRequest: the 32-byte HandshakeResponse41 PREFIX (caps with
    CLIENT_SSL, max packet, charset, 23 filler bytes) sent INSTEAD
    of the full response — the protocol's TLS upgrade point. The
    client sends this, wraps the socket, and repeats the handshake
    response (with the auth proof) over the secure channel."""
    caps = (CLIENT_LONG_PASSWORD | CLIENT_PROTOCOL_41
            | CLIENT_SECURE_CONNECTION | CLIENT_PLUGIN_AUTH
            | CLIENT_SSL)
    return struct.pack("<IIB", caps, 1 << 24, 33) + bytes(23)


def _pem_to_der(pem: bytes) -> bytes:
    """Strip PEM armor, base64-decode the body."""
    import base64

    lines = [ln.strip() for ln in pem.splitlines()
             if ln.strip() and not ln.strip().startswith(b"-----")]
    if not lines:
        raise ValueError("empty PEM public key from server")
    return base64.b64decode(b"".join(lines), validate=True)


def _asn1_tlv(buf: bytes, off: int) -> tuple[int, bytes, int]:
    """One DER TLV: (tag, content, offset past it). Handles the
    definite long-form lengths DER keys use; anything indefinite is
    not DER and refuses."""
    if off + 2 > len(buf):
        raise ValueError("truncated DER structure")
    tag = buf[off]
    ln = buf[off + 1]
    off += 2
    if ln & 0x80:
        n = ln & 0x7F
        if n == 0 or off + n > len(buf):
            raise ValueError("bad DER length")
        ln = int.from_bytes(buf[off:off + n], "big")
        off += n
    if off + ln > len(buf):
        raise ValueError("DER content past end")
    return tag, buf[off:off + ln], off + ln


def parse_rsa_public_key(pem: bytes) -> tuple[int, int]:
    """(n, e) from the server's PEM public key — both encodings a
    MySQL/Percona server emits: SubjectPublicKeyInfo ('BEGIN PUBLIC
    KEY': SEQ(SEQ(OID rsaEncryption, NULL), BITSTRING(PKCS#1))) and
    raw PKCS#1 ('BEGIN RSA PUBLIC KEY': SEQ(INT n, INT e)). Pure
    stdlib — the sandbox has no cryptography package, and the
    structure is ~4 TLVs deep."""
    der = _pem_to_der(pem)
    tag, seq, _ = _asn1_tlv(der, 0)
    if tag != 0x30:
        raise ValueError(f"expected DER SEQUENCE, got tag {tag:#x}")
    tag1, first, nxt = _asn1_tlv(seq, 0)
    if tag1 == 0x30:                       # SPKI: alg-id then BIT STRING
        tagb, bits, _ = _asn1_tlv(seq, nxt)
        if tagb != 0x03 or not bits or bits[0] != 0:
            raise ValueError("malformed SubjectPublicKeyInfo "
                             "BIT STRING")
        tag, seq, _ = _asn1_tlv(bits[1:], 0)
        if tag != 0x30:
            raise ValueError("PKCS#1 body is not a SEQUENCE")
        tag1, first, nxt = _asn1_tlv(seq, 0)
    if tag1 != 0x02:
        raise ValueError("expected INTEGER modulus")
    tag2, second, _ = _asn1_tlv(seq, nxt)
    if tag2 != 0x02:
        raise ValueError("expected INTEGER exponent")
    return (int.from_bytes(first, "big"),
            int.from_bytes(second, "big"))


def _mgf1_sha1(seed: bytes, length: int) -> bytes:
    out = bytearray()
    for i in range((length + 19) // 20):
        out += hashlib.sha1(seed + struct.pack(">I", i)).digest()
    return bytes(out[:length])


def rsa_oaep_sha1_encrypt(pem: bytes, message: bytes,
                          rand=None) -> bytes:
    """RSA-OAEP (RFC 8017 EME-OAEP, SHA-1 + MGF1-SHA1, empty label)
    — the padding MySQL's caching_sha2/sha256_password full-auth
    exchange uses (libmysql calls RSA_PKCS1_OAEP_PADDING).
    ``rand`` is injectable for the deterministic fixture tests;
    production callers take os.urandom."""
    import os as _os

    rand = rand or _os.urandom
    n, e = parse_rsa_public_key(pem)
    k = (n.bit_length() + 7) // 8
    h_len = 20
    if len(message) > k - 2 * h_len - 2:
        raise ValueError(
            f"message ({len(message)} bytes) too long for a "
            f"{k * 8}-bit OAEP envelope")
    l_hash = hashlib.sha1(b"").digest()
    ps = bytes(k - len(message) - 2 * h_len - 2)
    db = l_hash + ps + b"\x01" + message
    seed = rand(h_len)
    masked_db = bytes(a ^ b for a, b in
                      zip(db, _mgf1_sha1(seed, k - h_len - 1)))
    masked_seed = bytes(a ^ b for a, b in
                        zip(seed, _mgf1_sha1(masked_db, h_len)))
    em = b"\x00" + masked_seed + masked_db
    c = pow(int.from_bytes(em, "big"), e, n)
    return c.to_bytes(k, "big")


def xor_password_scramble(password: str, scramble: bytes) -> bytes:
    """The plaintext the RSA envelope carries: the NUL-terminated
    password XORed with the 20-byte scramble repeated — the server
    un-XORs with the nonce it issued, so a captured envelope cannot
    be replayed against a different handshake."""
    pwd = password.encode() + b"\x00"
    return bytes(b ^ scramble[i % len(scramble)]
                 for i, b in enumerate(pwd))


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


class GtidSet:
    """An executed-GTID set — ``{(source uuid, tag): disjoint
    sorted [start, stop) interval list}`` — with the three
    operations replication needs: accumulate GTIDs decoded off the
    stream (``add``), test coverage (``covers``), and serialize
    into the COM_BINLOG_DUMP_GTID wire encoding (``encode``:
    n_sids u64; per sid 16 raw uuid bytes + n_intervals u64 + per
    interval start u64, stop u64, stop EXCLUSIVE — the public
    Gtid_set layout). Text form is MySQL's ``uuid:1-5:8,uuid:12``
    (ranges inclusive), round-tripped by ``parse``/``__str__``.

    MySQL >= 8.3 tagged GTIDs (WL#15294): a GTID may carry a TAG —
    text form ``uuid:tag:1-5`` — and the tag is part of the source
    identity (``uuid:x:5`` and ``uuid:5`` are DIFFERENT
    transactions; a set covering one does not cover the other), so
    the interval map is keyed by (uuid, tag) with ``tag = ""`` for
    untagged. Tag syntax per the server's: starts with a letter or
    ``_``, then letters/digits/``_``, at most 32 chars,
    case-insensitively folded to lowercase. Within one uuid's text
    entry a tag field switches the tag for the interval fields
    after it (``uuid:1-5:x:1-3``); canonical output (matching
    GTID_EXECUTED's shape) puts untagged intervals first, then
    tags sorted. Without tag support an 8.3+ primary's
    GTID_EXECUTED / PREVIOUS_GTIDS would be rejected as malformed,
    disabling auto-position resume entirely (r10 verdict missing
    #2).

    This is the failover-safe resume currency: ``(file, pos)``
    positions die with the primary's binlog naming, the executed
    set does not (the reference itself resumes by file/pos,
    ``pkg/shared.go:13-14`` — auto-position is the step past it)."""

    def __init__(self) -> None:
        self._sids: dict[tuple[str, str], list[list[int]]] = {}

    #: WL#15294 tag syntax (server: mysql::gtid::Tag): leading
    #: letter/underscore, then word chars, <= 32 total; folded to
    #: lowercase. Structurally disjoint from intervals (which start
    #: with a digit), so the text walk below is unambiguous.
    _TAG = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]{0,31}$")

    @classmethod
    def _norm_tag(cls, tag: str) -> str:
        if tag and not cls._TAG.match(tag):
            raise ValueError(
                f"malformed gtid tag {tag!r} (want "
                "[a-z_][a-z0-9_]*, <= 32 chars)")
        return tag.lower()

    @staticmethod
    def _norm(uuid: str) -> str:
        u = uuid.replace("-", "").lower()
        if len(u) != 32:
            raise ValueError(f"malformed source uuid {uuid!r}")
        return u

    #: MariaDB's GTID text form is ``domain-server_id-sequence``
    #: (three decimal fields, no uuid, no colon) — recognize it so
    #: the refusal names the real problem instead of "malformed":
    #: MariaDB replication needs a DIFFERENT handshake (the slave
    #: sets @slave_connect_state / @mariadb_slave_capability and
    #: streams via plain COM_BINLOG_DUMP), not MySQL's
    #: COM_BINLOG_DUMP_GTID, so accepting the parse would fail
    #: confusingly at the wire instead of clearly at the config.
    _MARIADB_GTID = re.compile(r"^\d+-\d+-\d+$")

    @classmethod
    def parse(cls, text: str) -> "GtidSet":
        out = cls()
        for part in filter(None,
                           (p.strip() for p in text.split(","))):
            if cls._MARIADB_GTID.match(part):
                raise ValueError(
                    f"{part!r} is a MariaDB GTID (domain-server-"
                    f"sequence) — this is the MySQL-flavor set "
                    f"(COM_BINLOG_DUMP_GTID auto-position). Against "
                    f"MariaDB pass flavor=mariadb: the client then "
                    f"speaks the MariaDB handshake "
                    f"(@slave_connect_state + "
                    f"@mariadb_slave_capability over "
                    f"COM_BINLOG_DUMP) and parses this set as a "
                    f"MariaDbGtidSet")
            uuid, *fields = part.split(":")
            if not fields:
                raise ValueError(f"malformed gtid set entry {part!r}")
            sid, tag = cls._norm(uuid), ""
            saw_interval = True
            for rng in fields:
                if cls._TAG.match(rng):
                    # a tag field switches the tag for the interval
                    # fields after it (uuid:1-5:x:1-3); tags start
                    # with a letter/underscore, intervals with a
                    # digit — no overlap
                    if not saw_interval:
                        raise ValueError(
                            f"gtid tag with no intervals before "
                            f"{rng!r} in {part!r}")
                    tag, saw_interval = cls._norm_tag(rng), False
                    continue
                lo, _, hi = rng.partition("-")
                try:
                    start, last = int(lo), int(hi or lo)
                except ValueError:
                    raise ValueError(
                        f"malformed gtid range {rng!r} in {part!r}")
                if start < 1 or last < start:
                    # fail FAST: silently treating '5-3' as an empty
                    # interval makes every GTID "uncovered", so a
                    # typo'd startingGtids re-delivers the entire
                    # history and a GTID dump sends an invalid
                    # (stop < start) interval to the server
                    raise ValueError(
                        f"invalid gtid range {rng!r} (need "
                        f"1 <= start <= end) in {part!r}")
                out._insert((sid, tag), start, last + 1)
                saw_interval = True
            if not saw_interval:
                raise ValueError(
                    f"gtid tag {tag!r} with no intervals in {part!r}")
        return out

    def _insert(self, key: tuple[str, str], start: int,
                stop: int) -> None:
        ivs = self._sids.setdefault(key, [])
        ivs.append([start, stop])
        ivs.sort()
        merged = [ivs[0]]
        for s, e in ivs[1:]:                  # coalesce adjacency
            if s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        self._sids[key] = merged

    @classmethod
    def _split_gtid(cls, gtid: str) -> tuple[tuple[str, str], int]:
        """``uuid:gno`` or ``uuid:tag:gno`` -> ((sid, tag), gno)."""
        head, gno = gtid.rsplit(":", 1)
        uuid, _, tag = head.partition(":")
        return (cls._norm(uuid), cls._norm_tag(tag)), int(gno)

    def add(self, gtid: str) -> None:
        """One ``uuid:gno`` / ``uuid:tag:gno`` (a
        DecodedEvent.gtid string)."""
        key, g = self._split_gtid(gtid)
        self._insert(key, g, g + 1)

    def covers(self, gtid: str) -> bool:
        key, g = self._split_gtid(gtid)
        return any(s <= g < e for s, e in self._sids.get(key, ()))

    def merge(self, other: "GtidSet") -> None:
        """Union in another set (interval-wise, coalescing)."""
        for key, ivs in other._sids.items():
            for s, e in ivs:
                self._insert(key, s, e)

    def covers_set(self, other: "GtidSet") -> bool:
        """True iff every transaction in ``other`` is covered by
        this set (``other`` ⊆ ``self``). Intervals are coalesced and
        disjoint, so an interval of ``other`` is covered iff it fits
        inside a single interval of ``self``. This is the check
        MySQL's server runs against a PREVIOUS_GTIDS header before
        serving an auto-position dump (error 1236 'master has
        purged binary logs containing GTIDs that the slave
        requires' when it fails)."""
        for key, ivs in other._sids.items():
            mine = self._sids.get(key, ())
            for s, e in ivs:
                if not any(ms <= s and e <= me for ms, me in mine):
                    return False
        return True

    def __bool__(self) -> bool:
        return bool(self._sids)

    def __str__(self) -> str:
        parts = []
        bysid: dict[str, list[str]] = {}
        for sid, tag in sorted(self._sids,
                               key=lambda k: (k[0], k[1] != "", k[1])):
            rngs = ":".join(
                f"{s}-{e - 1}" if e - 1 > s else f"{s}"
                for s, e in self._sids[(sid, tag)])
            bysid.setdefault(sid, []).append(
                f"{tag}:{rngs}" if tag else rngs)
        for sid in sorted(bysid):
            u = f"{sid[0:8]}-{sid[8:12]}-{sid[12:16]}-" \
                f"{sid[16:20]}-{sid[20:32]}"
            parts.append(f"{u}:" + ":".join(bysid[sid]))
        return ",".join(parts)

    #: tagged-format marker arithmetic for the encoded n_sids field
    #: (WL#15294): a tagged set stores n_tsids * 8 + 1, an untagged
    #: set stores plain n_sids — byte-identical to the pre-8.3
    #: layout, so tag support costs old servers nothing. The
    #: arithmetic overlaps (untagged n_sids = 9 reads as tagged
    #: n_tsids = 1), so ``decode`` disambiguates STRUCTURALLY: try
    #: the tagged parse and require it to consume the blob exactly
    #: with well-formed tags, else fall back to untagged — the same
    #: whole-buffer validation the server's own decoder applies
    #: (it, too, has the total length in hand).
    _TAGGED_MARK = 8

    def encode(self) -> bytes:
        tagged = any(tag for _, tag in self._sids)
        n = len(self._sids)
        out = struct.pack(
            "<Q", n * self._TAGGED_MARK + 1 if tagged else n)
        for sid, tag in sorted(self._sids):
            ivs = self._sids[(sid, tag)]
            out += bytes.fromhex(sid)
            if tagged:
                # per-tsid tag block: 1-byte length + chars (empty
                # tag = single 0x00) — the Tsid encoding; only the
                # tagged format carries it
                out += bytes([len(tag)]) + tag.encode("ascii")
            out += struct.pack("<Q", len(ivs))
            for s, e in ivs:
                out += struct.pack("<QQ", s, e)
        return out

    @classmethod
    def _decode_tagged(cls, blob: bytes, n_tsids: int) -> "GtidSet":
        out = cls()
        p = 8
        for _ in range(n_tsids):
            if p + 17 > len(blob):
                raise ValueError("short tsid block")
            sid = blob[p:p + 16].hex()
            tlen = blob[p + 16]
            p += 17
            tag = blob[p:p + tlen].decode("ascii")
            if len(tag) != tlen or (tag and not cls._TAG.match(tag)):
                raise ValueError("malformed tag block")
            p += tlen
            (n_ivs,) = struct.unpack_from("<Q", blob, p)
            p += 8
            for _ in range(n_ivs):
                s, e = struct.unpack_from("<QQ", blob, p)
                p += 16
                if not 1 <= s < e:
                    # same strictness as the text parser — and it
                    # narrows the disambiguation window: an untagged
                    # blob misrouted here must now also produce
                    # well-ordered intervals to be wrongly accepted
                    raise ValueError(
                        f"invalid tagged interval [{s}, {e})")
                out._insert((sid, tag.lower()), s, e)
        if p not in (len(blob), len(blob) - 4):
            # exact consumption, OR exactly a 4-byte tail: a
            # PREVIOUS_GTIDS body read off a CRC32-checksummed
            # stream carries the event checksum after the set
            # (binlog_source._decode_prev_at passes the full
            # esize-19 body) — requiring exact consumption there
            # rejected every REAL tagged declaration (r11 review
            # wave 2 fallout)
            raise ValueError("trailing bytes after tagged set")
        return out

    @classmethod
    def decode(cls, blob: bytes) -> "GtidSet":
        """Inverse of ``encode`` (also the PREVIOUS_GTIDS event
        body layout, so a relay reader can seed from one) — both
        the pre-8.3 untagged layout and the 8.3+ tagged layout
        (disambiguation contract at ``_TAGGED_MARK``)."""
        (head,) = struct.unpack_from("<Q", blob, 0)
        if head % cls._TAGGED_MARK == 1:
            try:
                return cls._decode_tagged(blob,
                                          head // cls._TAGGED_MARK)
            except (ValueError, struct.error, UnicodeDecodeError):
                pass                    # structurally untagged
        out = cls()
        p = 8
        for _ in range(head):
            sid = blob[p:p + 16].hex()
            (n_ivs,) = struct.unpack_from("<Q", blob, p + 16)
            p += 24
            for _ in range(n_ivs):
                s, e = struct.unpack_from("<QQ", blob, p)
                p += 16
                if not 1 <= s < e:
                    # silent acceptance of a reversed interval made
                    # covers() False while str()/parse round-tripped
                    # to a DIFFERENT set — coverage decisions off a
                    # corrupt blob must fail loudly, matching the
                    # text parser and the tagged branch (r11 review
                    # wave 2, reproduced)
                    raise ValueError(
                        f"invalid interval [{s}, {e}) in encoded "
                        "gtid set")
                out._insert((sid, ""), s, e)
        return out


class MariaDbGtidSet:
    """MariaDB's replication position: ONE GTID per DOMAIN
    (``domain-server_id-sequence``; sequences are totally ordered
    within a domain), so the set is ``{domain: (server_id, seq)}``
    keeping the greatest sequence seen — not interval algebra.
    Text form is the comma-joined per-domain list MariaDB's
    ``@@gtid_slave_pos`` / ``@slave_connect_state`` carry.

    Coverage semantics mirror the server's: ``D-S-N`` is covered
    iff the set's domain-D position is at sequence >= N (the
    server_id is provenance, not ordering — a failover changes it
    while sequences continue). The same operations GtidSet exposes
    (parse/add/covers/merge/covers_set/str) make this a drop-in
    flavor variant behind the source's recognition seam.

    The reference reaches MariaDB with go-mysql's one-string
    ``Flavor: "mariadb"`` config (``internal/sync_server/
    sync.go:47``); this class plus the ``flavor`` parameters on
    ``_start_dump``/``tail_binlog``/``relay_to_segments`` are that
    switch re-expressed over raw bytes."""

    _FORM = re.compile(r"^(\d+)-(\d+)-(\d+)$")

    def __init__(self) -> None:
        self._domains: dict[int, tuple[int, int]] = {}

    @classmethod
    def parse(cls, text: str) -> "MariaDbGtidSet":
        out = cls()
        for part in filter(None,
                           (p.strip() for p in text.split(","))):
            m = cls._FORM.match(part)
            if not m:
                raise ValueError(
                    f"{part!r} is not a MariaDB GTID (expected "
                    "domain-server_id-sequence, three decimal "
                    "fields); MySQL uuid:interval sets belong to "
                    "flavor=mysql")
            out.add(part)
        return out

    def add(self, gtid: str) -> None:
        d, s, n = (int(x) for x in gtid.split("-"))
        cur = self._domains.get(d)
        if cur is None or n > cur[1]:
            self._domains[d] = (s, n)

    def covers(self, gtid: str) -> bool:
        d, _s, n = (int(x) for x in gtid.split("-"))
        cur = self._domains.get(d)
        return cur is not None and n <= cur[1]

    def merge(self, other: "MariaDbGtidSet") -> None:
        for d, (s, n) in other._domains.items():
            self.add(f"{d}-{s}-{n}")

    def covers_set(self, other: "MariaDbGtidSet") -> bool:
        """Every domain position in ``other`` at or below this
        set's — the purge/failover gate predicate (MariaDB's own
        error-1236 analog compares @slave_connect_state against
        gtid_binlog_state the same way)."""
        return all(d in self._domains and n <= self._domains[d][1]
                   for d, (_s, n) in other._domains.items())

    def __bool__(self) -> bool:
        return bool(self._domains)

    def __str__(self) -> str:
        return ",".join(f"{d}-{s}-{n}"
                        for d, (s, n) in sorted(self._domains.items()))


def build_binlog_dump_gtid(server_id: int, gtid_set: GtidSet,
                           non_blocking: bool = False) -> bytes:
    """COM_BINLOG_DUMP_GTID — auto-position: the server locates the
    first transaction NOT in the replica's executed set and streams
    from there, surviving primary failover where ``(file, pos)``
    names no longer exist. Layout (public protocol): u16 flags
    (BINLOG_THROUGH_GTID), u32 server_id, u32 name-len + name
    (empty = auto-position), u64 pos (4 = from start), u32
    data-size + encoded set."""
    flags = BINLOG_THROUGH_GTID
    if non_blocking:
        flags |= BINLOG_DUMP_NON_BLOCK
    data = gtid_set.encode()
    return (bytes([COM_BINLOG_DUMP_GTID])
            + struct.pack("<HI", flags, server_id)
            + struct.pack("<I", 0)               # empty file name
            + struct.pack("<Q", 4)
            + struct.pack("<I", len(data)) + data)


# ---- the client ------------------------------------------------------

def authenticate(conn: PacketConn, user: str, password: str,
                 ssl_context=None,
                 server_hostname: str | None = None) -> dict:
    """Connection phase over an already-connected socket: read
    HandshakeV10, answer HandshakeResponse41 with the server's
    announced plugin (``mysql_native_password`` or 8.0's DEFAULT
    ``caching_sha2_password`` fast path), then drive the auth state
    machine to OK:

    - ``ssl_context`` (an ``ssl.SSLContext``): upgrade to TLS at the
      protocol's upgrade point — SSLRequest (the 32-byte response
      prefix with CLIENT_SSL), then wrap the socket, then send the
      full HandshakeResponse41 over the secure channel (sequence
      numbers continue across the upgrade). Refused if the server
      does not announce CLIENT_SSL;
    - ``AuthMoreData`` ``0x01 0x03`` (sha2 fast-auth success):
      the OK packet follows;
    - ``AuthMoreData`` ``0x01 0x04`` (sha2 FULL auth — no cached
      entry, the first-ever connect for this account): over TLS the
      protocol specifies the cleartext password + NUL as the next
      packet (the channel provides the secrecy) — sent and the OK
      awaited. Over PLAINTEXT the client requests the server's RSA
      public key (``0x02``), parses the PEM/DER reply with the
      stdlib-only ASN.1 reader, and sends the scramble-XORed
      NUL-terminated password under RSA-OAEP(SHA-1 + MGF1-SHA1) —
      libmysql's RSA_PKCS1_OAEP_PADDING route, completing the last
      cell of the auth matrix (r9 verdict #3);
    - ``AuthSwitchRequest`` (0xFE + plugin + fresh scramble): the
      user's configured plugin differs from the offer — re-prove
      against the NEW scramble with the requested plugin (both
      supported plugins answered; one switch max, per protocol).
    """
    hs = parse_handshake_v10(conn.read_packet())
    plugin = hs["plugin"] or "mysql_native_password"
    if plugin not in _PLUGIN_PROOFS:
        raise ValueError(
            f"unsupported auth plugin {plugin!r} (this client "
            "implements mysql_native_password and the "
            "caching_sha2_password fast path)")
    tls_active = False
    if ssl_context is not None:
        if not hs["capabilities"] & CLIENT_SSL:
            raise ConnectionError(
                "TLS requested (ssl_context) but the server did not "
                "announce CLIENT_SSL — it is built without SSL or "
                "has it disabled (require_secure_transport cannot "
                "be on); connect without ssl_context or enable SSL "
                "on the server")
        conn.write_payload(build_ssl_request())
        conn.sock = ssl_context.wrap_socket(
            conn.sock, server_hostname=server_hostname)
        tls_active = True
    conn.write_payload(
        build_handshake_response(user, password, hs["scramble"],
                                 plugin, ssl_active=tls_active))
    switched = False
    cur_scramble = hs["scramble"]
    key_requested = False
    while True:
        payload = conn.read_packet()
        kind, info = classify_response(payload)
        if kind == "ok":
            return hs
        if kind == "err":
            raise ConnectionError(f"authentication failed: {info}")
        if payload[:1] == b"\x01":               # AuthMoreData
            if plugin == "caching_sha2_password" \
                    and payload[1:2] == b"\x03":
                continue                         # fast-auth OK next
            if plugin == "caching_sha2_password" \
                    and payload[1:2] == b"\x04":
                if tls_active:
                    # FULL auth, secure channel: the protocol's
                    # cleartext-password frame (NUL-terminated) —
                    # never sent on plaintext
                    conn.write_payload(password.encode() + b"\x00")
                    continue                     # OK (or ERR) next
                # FULL auth over plaintext: the RSA envelope — ask
                # the server for its public key (0x02); the key
                # arrives as the NEXT AuthMoreData frame
                conn.write_payload(b"\x02")
                key_requested = True
                continue
            if plugin == "caching_sha2_password" and key_requested:
                # the server's PEM public key: OAEP-encrypt the
                # scramble-XORed NUL-terminated password. The XOR
                # binds the envelope to THIS handshake's nonce, the
                # padding is libmysql's RSA_PKCS1_OAEP_PADDING.
                key_requested = False
                conn.write_payload(rsa_oaep_sha1_encrypt(
                    payload[1:],
                    xor_password_scramble(password, cur_scramble)))
                continue                         # OK (or ERR) next
            raise ValueError(
                f"unexpected AuthMoreData during {plugin} auth: "
                f"{payload[:8].hex()}")
        if payload[:1] == b"\xfe":               # AuthSwitchRequest
            if len(payload) < 9:
                raise ValueError(
                    "server requested the pre-4.1 old-password auth "
                    "switch, which this client does not implement")
            if switched:
                raise ConnectionError(
                    "server requested a second auth switch")
            nul = payload.index(b"\x00", 1)
            plugin = payload[1:nul].decode()
            scramble = payload[nul + 1:]
            if scramble.endswith(b"\x00"):
                scramble = scramble[:-1]         # one terminator max
            proof_fn = _PLUGIN_PROOFS.get(plugin)
            if proof_fn is None:
                raise ValueError(
                    f"unsupported auth plugin {plugin!r} in "
                    "AuthSwitchRequest")
            conn.write_payload(proof_fn(password, scramble))
            switched = True
            cur_scramble = scramble              # envelope binds to
            continue                             # the FRESH nonce
        raise ValueError(
            f"unexpected packet during authentication: "
            f"{payload[:8].hex()}")


def build_query(sql: str) -> bytes:
    return bytes([COM_QUERY]) + sql.encode()


def _set_var(conn: PacketConn, sql: str) -> None:
    conn.write_payload(build_query(sql), seq=0)
    kind, info = classify_response(conn.read_packet())
    if kind != "ok":
        raise ConnectionError(f"{sql.split('=')[0].strip()} "
                              f"refused: {info}")


def _start_dump(conn: PacketConn, server_id: int, file: str,
                pos: int, gtid_set: GtidSet | None = None,
                flavor: str = "mysql") -> None:
    """The pre-dump command phase a real 5.6+ master REQUIRES:
    ``SET @master_binlog_checksum = @@global.binlog_checksum``
    (without it a default-configured server refuses the dump with
    'Slave can not handle replication events with the checksum...'
    — the statement returns a plain OK, no resultset needed), then
    COM_REGISTER_SLAVE, then COM_BINLOG_DUMP — or, when a
    ``gtid_set`` is given, the flavor's auto-position:

    - ``flavor="mysql"``: COM_BINLOG_DUMP_GTID (``file``/``pos``
      ignored; the server resumes at the first transaction not in
      the set);
    - ``flavor="mariadb"``: MariaDB has NO separate dump command —
      GTID resume is carried in SESSION VARIABLES before a plain
      COM_BINLOG_DUMP with an empty file name:
      ``@slave_connect_state`` (the per-domain position list) and
      ``@mariadb_slave_capability=4`` (DML-in-GTID-groups tier,
      what current go-mysql/mariadb replicas announce). The server
      then streams from the first event past the connect state —
      exactly go-mysql's ``Flavor: "mariadb"`` behavior
      (``sync.go:47``)."""
    if flavor not in ("mysql", "mariadb"):
        raise ValueError(f"unknown flavor {flavor!r}: expected "
                         "'mysql' or 'mariadb'")
    if gtid_set is not None:
        want = MariaDbGtidSet if flavor == "mariadb" else GtidSet
        if not isinstance(gtid_set, want):
            raise ValueError(
                f"gtid_set is {type(gtid_set).__name__} but "
                f"flavor={flavor!r} needs {want.__name__} — the "
                "two flavors' GTID models are not convertible")
    _set_var(conn,
             "SET @master_binlog_checksum = @@global.binlog_checksum")
    if flavor == "mariadb":
        # capability >= 4 is UNCONDITIONAL for the flavor (r10
        # review): a real mariadbd substitutes GTID (162) events
        # with BEGIN Queries and GTID_LIST/BINLOG_CHECKPOINT with
        # dummies for capability < 4 — a file/pos-resumed stream
        # would then carry no flavor GTIDs at all and every
        # downstream failover/purge gate would be silently
        # disabled. go-mysql sets it for the flavor, not for the
        # resume mode. The connect state (when resuming by GTID)
        # must also be present BEFORE the dump command.
        _set_var(conn, "SET @mariadb_slave_capability = 4")
        if gtid_set is not None:
            _set_var(conn,
                     f"SET @slave_connect_state = '{gtid_set}'")
    conn.write_payload(build_register_slave(server_id), seq=0)
    kind, info = classify_response(conn.read_packet())
    if kind != "ok":
        raise ConnectionError(f"COM_REGISTER_SLAVE refused: {info}")
    if flavor == "mysql" and gtid_set is not None:
        conn.write_payload(build_binlog_dump_gtid(
            server_id, gtid_set, non_blocking=True), seq=0)
    else:
        # MariaDB GTID resume: empty file name + pos 4 (the connect
        # state owns the position); file/pos mode passes through
        dump_file = "" if (flavor == "mariadb"
                           and gtid_set is not None) else file
        dump_pos = 4 if (flavor == "mariadb"
                         and gtid_set is not None) else pos
        conn.write_payload(build_binlog_dump(server_id, dump_file,
                                             dump_pos,
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
                      max_events: int | None = None,
                      gtid_set: "GtidSet | MariaDbGtidSet | None" = None,
                      ssl_context=None,
                      server_hostname: str | None = None,
                      flavor: str = "mysql") -> int:
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
    authenticate(conn, user, password, ssl_context=ssl_context,
                 server_hostname=server_hostname)
    _start_dump(conn, server_id, file, pos, gtid_set=gtid_set,
                flavor=flavor)

    os.makedirs(out_dir, exist_ok=True)
    crc32_mode = False
    fde: bytes | None = None
    fh = None
    cur = file
    cur_path: str | None = None
    seg_virgin = False      # freshly created, nothing past the seed
    n = 0

    def open_segment(name: str):
        nonlocal fh, cur_path, seg_virgin
        if fh is not None:
            fh.flush()
            os.fsync(fh.fileno())
            fh.close()
        cur_path = os.path.join(out_dir, f"{name}.bin")
        fresh = not os.path.exists(cur_path)
        fh = open(cur_path, "ab")
        seg_virgin = fresh
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

                def _fde_sig(e: bytes) -> bytes:
                    # format signature: post-header body minus the
                    # checksum trailer, with create_timestamp
                    # (body[52:56]) masked — the 19-byte header
                    # (timestamp, log_pos) and create_timestamp
                    # differ between the carried seed and every new
                    # segment's real FDE, so comparing raw bytes
                    # fired the rewrite on EVERY rotation, not only
                    # on a genuine format change (r9 advice)
                    b = (e[19:len(e) - 4] if _detect_checksum(e)
                         else e[19:])
                    return b[:52] + b[56:]

                if (fh is not None and seg_virgin and fde is not None
                        and _fde_sig(ev) != _fde_sig(fde)):
                    # the just-rotated segment's REAL FDE differs
                    # from the carried seed — the rotation was
                    # forced by a config change that alters the FDE
                    # (e.g. SET GLOBAL binlog_checksum), so the
                    # seed mis-declares the checksum mode for every
                    # event that would follow it. Nothing but
                    # magic+seed is in the file yet: rewrite it
                    # with the stream's actual FDE.
                    fde = ev
                    fh.close()
                    fh = open(cur_path, "wb")
                    fh.write(MAGIC)
                    fh.write(fde)
                    continue
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
            seg_virgin = False
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
                file: str, pos: int, max_events: int | None = None,
                gtid_set: "GtidSet | MariaDbGtidSet | None" = None,
                ssl_context=None,
                server_hostname: str | None = None,
                flavor: str = "mysql"):
    """Generator over DecodedEvents from a live replication stream:
    authenticate, COM_REGISTER_SLAVE, COM_BINLOG_DUMP(file, pos) —
    or COM_BINLOG_DUMP_GTID auto-position when ``gtid_set`` is
    given — then yield each event packet's bytes through the byte
    decoder.

    Each network packet carries [0x00 OK byte][one binlog event];
    the per-connection TABLE_MAP state lives in an incremental
    decode loop exactly like the segment-file tier (the wire never
    re-sends TABLE_MAPs mid-stream, so state must persist across
    packets). ERR packets raise; EOF (0xFE short packet, sent under
    BINLOG_DUMP_NON_BLOCK) ends the stream.
    """
    from galaxy_spark.cdc.binlog import (ROTATE_EVENT,
                                         TABLE_MAP_EVENT,
                                         DecodedEvent, decode_binlog)

    conn = PacketConn(sock)
    authenticate(conn, user, password, ssl_context=ssl_context,
                 server_hostname=server_hostname)
    _start_dump(conn, server_id, file, pos, gtid_set=gtid_set,
                flavor=flavor)

    # incremental decode: accumulate event bytes; decode_binlog is
    # re-run over the buffer so TABLE_MAP state is always in scope.
    # BOUNDED by open-transaction tracking: the only cross-packet
    # decode dependency is TABLE_MAP -> rows WITHIN one transaction
    # (every transaction re-sends its TABLE_MAPs), so the buffer
    # resets to just the stream's FDE whenever no transaction is
    # open. A transaction opens at QUERY 'BEGIN' (or a raw
    # TABLE_MAP packet — belt and braces for streams that skip the
    # BEGIN) and closes at XID, ROTATE, or ANY other QUERY — which
    # covers InnoDB (XID), non-transactional engines committing via
    # QUERY 'COMMIT'/'ROLLBACK', and DDL/GTID-only stretches that
    # never emit an XID at all (each DDL QUERY is an auto-commit
    # boundary). Per-packet re-decode cost stays O(open
    # transaction), never O(stream history).
    buf = b""
    fde_raw = b""
    n_seen = 0
    n_out = 0
    open_txn = False
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
            if ev.kind == "query":
                stmt = (ev.query or "").strip().upper()
                # BEGIN opens; COMMIT/ROLLBACK close (MyISAM's
                # commit marker — no XID); any OTHER statement is
                # an auto-commit boundary (DDL cannot run inside an
                # open transaction: implicit commit)
                open_txn = stmt == "BEGIN"
            elif ev.kind in ("xid", "rotate"):
                open_txn = False
            yield ev
            n_out += 1
            if max_events is not None and n_out >= max_events:
                return
        n_seen = len(events)
        if ev_bytes[4] == TABLE_MAP_EVENT:
            # TABLE_MAPs surface no DecodedEvent but open the
            # rows-decode dependency window: the buffer must hold
            # them until their rows events arrive and the group
            # closes
            open_txn = True
        if not open_txn:
            buf = fde_raw                        # transaction done
            n_seen = 1 if fde_raw else 0
