"""SQLite file-format reader (operators/sqlite.py): cross-validated
against databases written by the independent CPython sqlite3 engine —
interior B-trees, overflow chains, the IPK rowid alias, type fidelity,
and loud failures."""

from __future__ import annotations

import os
import sqlite3
import tempfile

import pytest

from etl_pipeline_old_spark.operators.sqlite import (
    SQLiteFile, read_sqlite_table,
)


def _build(page_size=4096, n=50, textlen=300):
    fd, path = tempfile.mkstemp(suffix=".db")
    os.close(fd)
    os.unlink(path)
    con = sqlite3.connect(path)
    con.execute(f"PRAGMA page_size={page_size}")
    con.execute(
        "CREATE TABLE docs (id INTEGER PRIMARY KEY, body TEXT, "
        "score REAL, flag INT, data BLOB)"
    )
    rows = [
        (
            i,
            (f"x{i}_") * (textlen // 5),
            i / 4.0,
            i % 2,
            bytes([i % 256]) * (i % 7),
        )
        for i in range(1, n + 1)
    ]
    con.executemany("INSERT INTO docs VALUES (?,?,?,?,?)", rows)
    con.commit()
    con.close()
    blob = open(path, "rb").read()
    os.unlink(path)
    return blob, rows


def test_single_leaf_roundtrip_and_ipk_alias():
    blob, rows = _build()
    got = read_sqlite_table(blob, "docs")
    assert [tuple(g) for g in got] == rows
    # the id column is stored as NULL in the record (the IPK alias);
    # without substitution it must come back None
    raw = read_sqlite_table(blob, "docs", ipk_col=None)
    assert all(g[0] is None for g in raw)


def test_interior_btree_pages():
    blob, rows = _build(page_size=512, n=500, textlen=60)
    got = read_sqlite_table(blob, "docs")
    assert len(got) == 500
    assert [tuple(g) for g in got] == rows


def test_overflow_chains():
    # 5000-char text on 512-byte pages: every row spills to overflow
    blob, rows = _build(page_size=512, n=20, textlen=5000)
    got = read_sqlite_table(blob, "docs")
    assert [g[1] for g in got] == [r[1] for r in rows]


def test_type_fidelity_against_sqlite3():
    fd, path = tempfile.mkstemp(suffix=".db")
    os.close(fd)
    os.unlink(path)
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE t (a, b, c, d)")
    rows = [
        (None, -1, 0.5, b"\x00\xff"),
        (2 ** 62, "Привет", -2.25, b""),
        (0, 1, float(10 ** 10), "mixed affinity"),
        (-(2 ** 31), "", 0.0, None),
    ]
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", rows)
    con.commit()
    blob = open(path, "rb").read()
    expect = list(con.execute("SELECT a,b,c,d FROM t ORDER BY rowid"))
    con.close()
    os.unlink(path)
    got = read_sqlite_table(blob, "t", ipk_col=None)
    assert [tuple(g) for g in got] == expect


def test_schema_listing():
    blob, _ = _build()
    db = SQLiteFile(blob)
    assert "docs" in db.schema()
    assert db.page_size == 4096


def test_loud_failures():
    with pytest.raises(ValueError, match="magic"):
        read_sqlite_table(b"not a database file" * 10, "t")
    blob, _ = _build()
    with pytest.raises(ValueError, match="not in schema"):
        read_sqlite_table(blob, "ghost")
    # index pages must be refused, not misparsed: corrupt the root
    # page type byte of the docs table
    db = SQLiteFile(blob)
    root = db.schema()["docs"]
    at = (root - 1) * db.page_size
    bad = blob[:at] + b"\x0a" + blob[at + 1 :]
    with pytest.raises(ValueError, match="page type"):
        read_sqlite_table(bad, "docs")


# -------------------------------------------------------- WAL sidecar (r12)

from etl_pipeline_old_spark.operators.sqlite import (  # noqa: E402
    apply_wal, read_wal_frames,
)


def _build_wal(n_wal_commits=3, page_size=512):
    """Base era committed in rollback mode (lands in the main file),
    then journal_mode=WAL and per-row commits (land in the -wal);
    bytes captured BEFORE close (close checkpoints and deletes the
    sidecar — exactly why a live copy ships one)."""
    d = tempfile.mkdtemp()
    path = os.path.join(d, "x.db")
    con = sqlite3.connect(path)
    con.execute(f"PRAGMA page_size={page_size}")
    con.execute("CREATE TABLE docs (id INTEGER PRIMARY KEY, body TEXT)")
    con.execute("INSERT INTO docs VALUES (1, 'base one')")
    con.execute("INSERT INTO docs VALUES (2, 'base two')")
    con.commit()
    con.execute("PRAGMA journal_mode=WAL")
    for i in range(n_wal_commits):
        con.execute(
            "INSERT INTO docs VALUES (?, ?)", (3 + i, f"wal row {i} строка")
        )
        con.commit()
    with open(path, "rb") as fh:
        db = fh.read()
    with open(path + "-wal", "rb") as fh:
        wal = fh.read()
    con.close()
    import shutil

    shutil.rmtree(d)
    return db, wal


def test_wal_overlay_matches_sqlite3_recovery():
    db, wal = _build_wal()
    ours = read_sqlite_table(apply_wal(db, wal), "docs")
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "y.db"), "wb") as fh:
        fh.write(db)
    with open(os.path.join(d, "y.db-wal"), "wb") as fh:
        fh.write(wal)
    con = sqlite3.connect(os.path.join(d, "y.db"))
    ref = con.execute("SELECT id, body FROM docs ORDER BY id").fetchall()
    con.close()
    import shutil

    shutil.rmtree(d)
    assert [tuple(r) for r in ours] == ref
    assert len(ref) == 5  # WAL rows really are invisible without it
    assert len(read_sqlite_table(db, "docs")) == 2


def test_wal_torn_tail_keeps_committed_prefix():
    db, wal = _build_wal()
    full = read_sqlite_table(apply_wal(db, wal), "docs")
    # flipped byte in the last frame's content: checksum stops the walk
    torn = bytearray(wal)
    torn[-10] ^= 0xFF
    prefix = read_sqlite_table(apply_wal(db, bytes(torn)), "docs")
    assert prefix == full[:-1]
    # garbage appended after the real frames: ignored the same way
    assert read_sqlite_table(apply_wal(db, wal + b"\xab" * 700),
                             "docs") == full
    # truncated to two whole frames: two committed WAL rows survive
    cut = wal[: 32 + 2 * (24 + 512)]
    assert read_sqlite_table(apply_wal(db, cut), "docs") == full[:-1]


def test_wal_salt_mismatch_stops_the_walk():
    db, wal = _build_wal()
    bad = bytearray(wal)
    # flip salt-1 inside the FIRST frame header (offset 32+8)
    bad[32 + 8] ^= 0x55
    assert read_sqlite_table(apply_wal(db, bytes(bad)), "docs") == \
        read_sqlite_table(db, "docs")


def test_wal_uncommitted_tail_frames_are_not_applied():
    db, wal = _build_wal()
    ps, pages, size = read_wal_frames(wal)
    assert ps == 512 and size >= 1
    # zero out the commit-size field of the LAST frame: its content is
    # checksum-broken then, so rebuild a synthetic check instead —
    # simply dropping the final frame means its commit never happened
    cut = wal[: 32 + (len(wal) - 32) - (24 + 512)]
    got = read_sqlite_table(apply_wal(db, cut), "docs")
    assert len(got) == 4


def test_wal_loud_damage():
    db, wal = _build_wal()
    with pytest.raises(ValueError, match="magic"):
        apply_wal(db, b"\x00" * 32)
    with pytest.raises(ValueError, match="shorter"):
        apply_wal(db, wal[:16])
    hdr = bytearray(wal)
    hdr[20] ^= 1  # salt byte inside the checksummed header prefix
    with pytest.raises(ValueError, match="header checksum"):
        apply_wal(db, bytes(hdr))
