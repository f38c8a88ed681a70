"""SQLite database-file reader — own implementation of the public
SQLite file format (sqlite.org/fileformat2), pure stdlib.

Why this exists: real document corpora carry .sqlite/.db files
constantly — app exports, chat-log backups, browser histories,
annotation tools — and a pipeline ingests them as BLOBS from an object
store, where shelling out to a database engine per record is not a
plan.  This module walks the file format directly inside the Arrow
kernel: header, page tree, records.  The independent CPython
``sqlite3`` engine (which WRITES every staged fixture) is the
cross-validation oracle in tests/test_sqlite.py.

Implemented from the published format:

- **Header** (100 bytes): magic, page size (65536 encoded as 1),
  text encoding (UTF-8/16LE/16BE all decoded), freelist/page counts.
- **B-tree pages**: table leaves (0x0D) and interiors (0x05) walked
  recursively via the cell-pointer array and right-most pointer; index
  pages are skipped (we extract DATA).
- **Records**: varint header of serial types, then values — NULL,
  1/2/3/4/6/8-byte big-endian twos-complement ints, IEEE double, the
  constants 0/1 (schema 4+), text/blob with (n-13)/2 and (n-12)/2
  lengths; the ROWID replaces a NULL in the INTEGER PRIMARY KEY column
  (the alias rule naive readers miss — the key column reads as NULL in
  the record itself).
- **Overflow chains**: a leaf cell whose payload exceeds the page's
  local maximum spills to a linked list of overflow pages (4-byte next
  pointers); the local-payload split uses the spec's K formula, not a
  guess — off-by-one here silently truncates long documents.
- **sqlite_schema**: page 1's table (offset by the 100-byte header)
  maps table names to root pages, so extraction is by NAME.

WAL sidecars read natively (r12): a .db copied mid-write ships a -wal
file whose committed frames hold the newest page images — ``apply_wal``
validates salts + the spec's cumulative rolling checksum frame by
frame, stops at the first torn frame (the valid prefix IS the
snapshot), keeps pages only up to the last commit frame, and overlays
them onto the main file; cross-validated against CPython's sqlite3
opening the same db+wal pair (tests/test_sqlite.py).  Freelist
scavenging and index B-trees stay out of scope (documented); damage
(bad magic, unknown page type, truncated record, cyclic overflow
chain, WAL header checksum mismatch, page-size disagreement) raises
ValueError — one database costs one record, never the job.
"""

from __future__ import annotations

import struct

_MAGIC = b"SQLite format 3\x00"


def _varint(buf: bytes, at: int):
    """SQLite varint: 1-9 bytes, big-endian 7-bit groups; the 9th byte
    contributes 8 bits."""
    acc = 0
    for i in range(8):
        b = buf[at + i]
        acc = (acc << 7) | (b & 0x7F)
        if not b & 0x80:
            return acc, at + i + 1
    acc = (acc << 8) | buf[at + 8]
    if acc >= 1 << 63:
        acc -= 1 << 64
    return acc, at + 9


class SQLiteFile:
    def __init__(self, blob: bytes):
        if blob[:16] != _MAGIC:
            raise ValueError("sqlite: bad header magic")
        ps = struct.unpack_from(">H", blob, 16)[0]
        self.page_size = 65536 if ps == 1 else ps
        enc = struct.unpack_from(">I", blob, 56)[0]
        try:
            self.encoding = {1: "utf-8", 2: "utf-16-le", 3: "utf-16-be"}[enc]
        except KeyError:
            raise ValueError(f"sqlite: unknown text encoding {enc}")
        self.n_pages = struct.unpack_from(">I", blob, 28)[0]
        self.buf = blob
        self.usable = self.page_size - struct.unpack_from(">B", blob, 20)[0]

    # ----------------------------------------------------------- pages
    def _page(self, num: int) -> int:
        if not 1 <= num <= max(self.n_pages, len(self.buf) // self.page_size):
            raise ValueError(f"sqlite: page {num} out of range")
        return (num - 1) * self.page_size

    def _walk_table(self, root: int, out: list, depth: int = 0) -> None:
        if depth > 32:
            raise ValueError("sqlite: B-tree too deep (cycle?)")
        base = self._page(root)
        hdr = base + (100 if root == 1 else 0)
        ptype = self.buf[hdr]
        n_cells = struct.unpack_from(">H", self.buf, hdr + 3)[0]
        if ptype == 0x05:  # interior table page
            right = struct.unpack_from(">I", self.buf, hdr + 8)[0]
            cp0 = hdr + 12
            for i in range(n_cells):
                cell = base + struct.unpack_from(
                    ">H", self.buf, cp0 + 2 * i
                )[0]
                child = struct.unpack_from(">I", self.buf, cell)[0]
                self._walk_table(child, out, depth + 1)
            self._walk_table(right, out, depth + 1)
            return
        if ptype != 0x0D:
            raise ValueError(f"sqlite: unexpected page type 0x{ptype:02x}")
        cp0 = hdr + 8
        for i in range(n_cells):
            cell = base + struct.unpack_from(">H", self.buf, cp0 + 2 * i)[0]
            payload_len, at = _varint(self.buf, cell)
            rowid, at = _varint(self.buf, at)
            payload = self._payload(at, payload_len)
            out.append((rowid, self._record(payload)))

    def _payload(self, at: int, total: int) -> bytes:
        """Assemble a cell payload, following the overflow chain when
        the spec's local-maximum formula says it spills."""
        u = self.usable
        x = u - 35  # max local payload for a table leaf
        if total <= x:
            return self.buf[at : at + total]
        m = ((u - 12) * 32 // 255) - 23
        k = m + (total - m) % (u - 4)
        local = k if k <= x else m
        out = bytearray(self.buf[at : at + local])
        nxt = struct.unpack_from(">I", self.buf, at + local)[0]
        seen = set()
        while nxt:
            if nxt in seen:
                raise ValueError("sqlite: cyclic overflow chain")
            seen.add(nxt)
            p = self._page(nxt)
            nxt = struct.unpack_from(">I", self.buf, p)[0]
            out += self.buf[p + 4 : p + u]
        if len(out) < total:
            raise ValueError("sqlite: truncated overflow payload")
        return bytes(out[:total])

    # --------------------------------------------------------- records
    def _record(self, payload: bytes) -> list:
        hlen, at = _varint(payload, 0)
        serials = []
        while at < hlen:
            s, at = _varint(payload, at)
            serials.append(s)
        at = hlen
        vals = []
        for s in serials:
            if s == 0:
                vals.append(None)
            elif 1 <= s <= 6:
                n = (1, 2, 3, 4, 6, 8)[s - 1]
                raw = payload[at : at + n]
                if len(raw) != n:
                    raise ValueError("sqlite: truncated integer value")
                vals.append(int.from_bytes(raw, "big", signed=True))
                at += n
            elif s == 7:
                vals.append(struct.unpack_from(">d", payload, at)[0])
                at += 8
            elif s in (8, 9):
                vals.append(s - 8)
            elif s >= 12 and s % 2 == 0:
                n = (s - 12) // 2
                vals.append(payload[at : at + n])
                at += n
            elif s >= 13:
                n = (s - 13) // 2
                raw = payload[at : at + n]
                if len(raw) != n:
                    raise ValueError("sqlite: truncated text value")
                vals.append(raw.decode(self.encoding))
                at += n
            else:
                raise ValueError(f"sqlite: reserved serial type {s}")
        return vals

    # ----------------------------------------------------------- tables
    def schema(self) -> dict:
        """``{table_name: rootpage}`` from the sqlite_schema table."""
        rows: list = []
        self._walk_table(1, rows)
        out = {}
        for _rowid, rec in rows:
            # sqlite_schema: type, name, tbl_name, rootpage, sql
            if len(rec) >= 4 and rec[0] == "table":
                out[rec[1]] = rec[3]
        return out

    def read_table(self, name: str) -> list:
        """All rows of ``name`` as lists, with the INTEGER PRIMARY KEY
        alias resolved: a NULL in the record is the ROWID."""
        root = self.schema().get(name)
        if root is None:
            raise ValueError(f"sqlite: table {name!r} not in schema")
        rows: list = []
        self._walk_table(root, rows)
        out = []
        for rowid, rec in rows:
            # the IPK column is stored as NULL in the record; SQLite
            # only ever aliases ONE column, conventionally the first
            # NULL whose declared type was INTEGER PRIMARY KEY — for
            # extraction we substitute the rowid into the first NULL
            # slot only when the writer used an IPK (callers that know
            # better read (rowid, values) pairs via walk()).
            out.append((rowid, rec))
        return out


# ------------------------------------------------------------------ WAL
# Write-Ahead Log sidecar (sqlite.org/fileformat2 §The WAL File Format
# + sqlite.org/wal): a .db snapshotted mid-write ships a -wal file whose
# COMMITTED frames carry the newest page images — ignoring it reads a
# stale (or even schema-less) database.  The reader below reconstructs
# the effective database bytes: walk frames in order, validate each
# frame's salts against the WAL header and its CUMULATIVE checksum
# (the spec's two-word rolling sum over the header prefix, then each
# frame's first 8 header bytes + page content, in the byte order the
# magic selects), stop at the first invalid frame (a torn tail is
# expected — that is the snapshot-mid-write case), keep only frames up
# to the LAST commit frame, and overlay the latest committed image of
# each page onto the main file at the commit's declared database size.

_WAL_MAGIC_LE = 0x377F0682  # checksum words little-endian
_WAL_MAGIC_BE = 0x377F0683


def _wal_checksum(data: bytes, big_endian: bool, s1: int = 0,
                  s2: int = 0) -> tuple[int, int]:
    if len(data) % 8:
        raise ValueError("sqlite wal: checksum input not 8-byte aligned")
    fmt = ">I" if big_endian else "<I"
    for i in range(0, len(data), 8):
        x0 = struct.unpack_from(fmt, data, i)[0]
        x1 = struct.unpack_from(fmt, data, i + 4)[0]
        s1 = (s1 + x0 + s2) & 0xFFFFFFFF
        s2 = (s2 + x1 + s1) & 0xFFFFFFFF
    return s1, s2


def read_wal_frames(wal: bytes) -> tuple[int, dict, int]:
    """Parse a -wal sidecar → (page_size, {page_number: page_bytes} for
    the latest COMMITTED image of each page, db_size_pages from the
    last commit frame; 0 if no commit frame survives).  Frames stop at
    the first salt or cumulative-checksum mismatch — the valid prefix
    is the committed snapshot, per the WAL design."""
    if len(wal) < 32:
        raise ValueError("sqlite wal: shorter than its 32-byte header")
    magic, version, page_size, _ckpt, salt1, salt2, c1, c2 = struct.unpack(
        ">8I", wal[:32]
    )
    if magic == _WAL_MAGIC_BE:
        big = True
    elif magic == _WAL_MAGIC_LE:
        big = False
    else:
        raise ValueError(f"sqlite wal: bad magic 0x{magic:08x}")
    if version != 3007000:
        raise ValueError(f"sqlite wal: unknown format version {version}")
    s1, s2 = _wal_checksum(wal[:24], big)
    if (s1, s2) != (c1, c2):
        raise ValueError("sqlite wal: header checksum mismatch")
    pages: dict[int, bytes] = {}
    pending: dict[int, bytes] = {}
    db_size = 0
    at = 32
    frame_len = 24 + page_size
    while at + frame_len <= len(wal):
        pgno, commit_size, fs1, fs2, fc1, fc2 = struct.unpack_from(
            ">6I", wal, at
        )
        if (fs1, fs2) != (salt1, salt2):
            break  # stale frame from a previous checkpoint cycle
        s1, s2 = _wal_checksum(wal[at : at + 8], big, s1, s2)
        s1, s2 = _wal_checksum(
            wal[at + 24 : at + frame_len], big, s1, s2
        )
        if (s1, s2) != (fc1, fc2):
            break  # torn tail: the valid prefix is the snapshot
        pending[pgno] = wal[at + 24 : at + frame_len]
        if commit_size:
            pages.update(pending)
            pending.clear()
            db_size = commit_size
        at += frame_len
    return page_size, pages, db_size


def apply_wal(db: bytes, wal: bytes) -> bytes:
    """Overlay a -wal sidecar's committed frames onto the main database
    bytes, returning the EFFECTIVE database a WAL-aware engine would
    read.  With no committed frames the main file is returned as-is."""
    page_size, pages, db_size = read_wal_frames(wal)
    if not db_size:
        return db
    if db[:16] == _MAGIC:
        main_ps = struct.unpack_from(">H", db, 16)[0]
        main_ps = 65536 if main_ps == 1 else main_ps
        if main_ps != page_size:
            raise ValueError(
                "sqlite wal: page size disagrees with the main file"
            )
    elif 1 not in pages:
        raise ValueError(
            "sqlite wal: main file has no header and the WAL does not "
            "carry page 1"
        )
    out = bytearray(db[: db_size * page_size])
    if len(out) < db_size * page_size:
        out += b"\x00" * (db_size * page_size - len(out))
    for pgno, content in pages.items():
        if not 1 <= pgno <= db_size:
            # a frame for a page beyond the committed size belongs to a
            # rolled-back grow — committed truncation wins
            continue
        off = (pgno - 1) * page_size
        out[off : off + page_size] = content
    return bytes(out)


def read_sqlite_table(blob: bytes, table: str, ipk_col: int | None = 0):
    """Convenience: rows of ``table`` with the INTEGER-PRIMARY-KEY alias
    applied at ``ipk_col`` (None = no aliased column)."""
    db = SQLiteFile(blob)
    out = []
    for rowid, rec in db.read_table(table):
        if ipk_col is not None and ipk_col < len(rec) and rec[ipk_col] is None:
            rec = list(rec)
            rec[ipk_col] = rowid
        out.append(rec)
    return out
