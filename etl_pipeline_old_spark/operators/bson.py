"""BSON (bsonspec.org 1.1) — own pure-stdlib codec for mongodump-style
shards.

Why this exists: MongoDB dumps (.bson files — concatenated BSON
documents, exactly what ``mongodump`` writes) are a routine lake
ingestion class: app exports, chat logs, product catalogs.  A pipeline
reads them as blobs from an object store; shelling out to a Mongo
client per record is not a plan.  No independent BSON implementation
exists in this container (no pymongo), so — like FLAC and VP8L — the
codec is pinned by the public spec: an own writer stages fixtures, the
oracle demands byte-exact value recovery, and the hostile classes
(length lies, truncation, nesting bombs, unknown types, unterminated
cstrings) are unit-swept loud.

Implemented types (the ones real dumps carry): 0x01 double (LE
IEEE 754), 0x02 string (int32 byte length INCLUDING the NUL, UTF-8),
0x03 embedded document, 0x04 array (a document with "0","1",...
keys, re-listed on read), 0x05 binary (int32 + subtype byte),
0x07 ObjectId (12 bytes), 0x08 boolean, 0x09 UTC datetime
(int64 millis), 0x0A null, 0x10 int32, 0x11 timestamp (uint64),
0x12 int64.  All integers little-endian per spec.  Anything else
raises — silently skipping a value would desynchronize the walk.

Damage raises ValueError: a document length that disagrees with its
terminator, a string whose declared length overruns the document, an
element name without a NUL, nesting beyond 64 levels (the spec-less
bomb guard), trailing garbage after the last document.
"""

from __future__ import annotations

import struct

_MAX_DEPTH = 64


def _cstring(buf: bytes, at: int, end: int) -> tuple[str, int]:
    z = buf.find(b"\x00", at, end)
    if z < 0:
        raise ValueError("bson: unterminated element name")
    return buf[at:z].decode("utf-8"), z + 1


def _read_document(buf: bytes, at: int, depth: int = 0):
    if depth > _MAX_DEPTH:
        raise ValueError("bson: document nesting too deep")
    if at + 4 > len(buf):
        raise ValueError("bson: truncated document length")
    total = struct.unpack_from("<i", buf, at)[0]
    end = at + total
    if total < 5 or end > len(buf):
        raise ValueError("bson: document length out of range")
    if buf[end - 1] != 0:
        raise ValueError("bson: document missing its terminator")
    pos = at + 4
    out: dict = {}
    while pos < end - 1:
        etype = buf[pos]
        name, pos = _cstring(buf, pos + 1, end - 1)
        try:
            value, pos = _read_element(buf, pos, end, etype, depth)
        except (struct.error, IndexError) as exc:
            # struct.error: a fixed-width unpack ran off the buffer;
            # IndexError: a single-byte read (binary subtype, boolean)
            # did the same — both are the torn-shard class and must
            # surface as the documented ValueError so quarantine
            # kernels cost one record, never the job.
            raise ValueError(f"bson: truncated value ({exc})") from exc
        if pos > end - 1:
            raise ValueError("bson: element overruns its document")
        out[name] = value
    if pos != end - 1:
        raise ValueError("bson: element walk missed the terminator")
    return out, end


def _read_element(buf: bytes, pos: int, end: int, etype: int, depth: int):
        if etype == 0x01:
            value = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif etype == 0x02:
            n = struct.unpack_from("<i", buf, pos)[0]
            pos += 4
            if n < 1 or pos + n > end - 1:
                raise ValueError("bson: string length out of range")
            if buf[pos + n - 1] != 0:
                raise ValueError("bson: string missing its NUL")
            value = buf[pos : pos + n - 1].decode("utf-8")
            pos += n
        elif etype in (0x03, 0x04):
            value, pos = _read_document(buf, pos, depth + 1)
            if etype == 0x04:
                # arrays are documents keyed "0","1",... — re-list and
                # REFUSE gaps (a forged key would silently reorder)
                lst = []
                for i in range(len(value)):
                    if str(i) not in value:
                        raise ValueError("bson: array keys not dense")
                    lst.append(value[str(i)])
                value = lst
        elif etype == 0x05:
            n = struct.unpack_from("<i", buf, pos)[0]
            subtype = buf[pos + 4]
            pos += 5
            if n < 0 or pos + n > end - 1:
                raise ValueError("bson: binary length out of range")
            value = (subtype, buf[pos : pos + n])
            pos += n
        elif etype == 0x07:
            value = buf[pos : pos + 12]
            if len(value) != 12:
                raise ValueError("bson: truncated ObjectId")
            pos += 12
        elif etype == 0x08:
            b = buf[pos]
            if b not in (0, 1):
                raise ValueError(f"bson: boolean byte {b}")
            value = bool(b)
            pos += 1
        elif etype == 0x09:
            value = ("datetime_ms", struct.unpack_from("<q", buf, pos)[0])
            pos += 8
        elif etype == 0x0A:
            value = None
        elif etype == 0x10:
            value = struct.unpack_from("<i", buf, pos)[0]
            pos += 4
        elif etype == 0x11:
            value = ("timestamp", struct.unpack_from("<Q", buf, pos)[0])
            pos += 8
        elif etype == 0x12:
            value = struct.unpack_from("<q", buf, pos)[0]
            pos += 8
        else:
            raise ValueError(
                f"bson: element type 0x{etype:02x} not implemented "
                "(skipping would desynchronize the walk)"
            )
        return value, pos


def read_bson_shard(blob: bytes) -> list[dict]:
    """Parse a mongodump-style shard (concatenated documents)."""
    docs = []
    at = 0
    while at < len(blob):
        doc, at = _read_document(blob, at)
        docs.append(doc)
    return docs


# --------------------------------------------------------------- writer


def _write_value(out: bytearray, name: str, value, depth: int) -> None:
    if depth > _MAX_DEPTH:
        raise ValueError("bson: document nesting too deep")
    key = name.encode("utf-8") + b"\x00"
    if isinstance(value, bool):  # before int: bool IS an int in Python
        out += b"\x08" + key + (b"\x01" if value else b"\x00")
    elif isinstance(value, float):
        out += b"\x01" + key + struct.pack("<d", value)
    elif isinstance(value, int):
        if -(2 ** 31) <= value < 2 ** 31:
            out += b"\x10" + key + struct.pack("<i", value)
        else:
            out += b"\x12" + key + struct.pack("<q", value)
    elif isinstance(value, str):
        enc = value.encode("utf-8") + b"\x00"
        out += b"\x02" + key + struct.pack("<i", len(enc)) + enc
    elif value is None:
        out += b"\x0a" + key
    elif isinstance(value, dict):
        out += b"\x03" + key + write_bson_document(value, depth + 1)
    elif isinstance(value, list):
        out += b"\x04" + key + write_bson_document(
            {str(i): v for i, v in enumerate(value)}, depth + 1
        )
    elif isinstance(value, tuple) and value and value[0] == "datetime_ms":
        out += b"\x09" + key + struct.pack("<q", value[1])
    elif isinstance(value, tuple) and value and value[0] == "timestamp":
        out += b"\x11" + key + struct.pack("<Q", value[1])
    elif isinstance(value, tuple) and len(value) == 2 \
            and isinstance(value[1], bytes) and isinstance(value[0], int):
        out += (b"\x05" + key + struct.pack("<i", len(value[1]))
                + bytes([value[0]]) + value[1])
    elif isinstance(value, bytes) and len(value) == 12:
        out += b"\x07" + key + value  # ObjectId
    else:
        raise ValueError(f"bson: no encoding for {type(value).__name__}")


def write_bson_document(doc: dict, depth: int = 0) -> bytes:
    body = bytearray()
    for name, value in doc.items():
        _write_value(body, name, value, depth)
    return struct.pack("<i", len(body) + 5) + bytes(body) + b"\x00"


def write_bson_shard(docs: list[dict]) -> bytes:
    return b"".join(write_bson_document(d) for d in docs)
