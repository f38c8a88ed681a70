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
