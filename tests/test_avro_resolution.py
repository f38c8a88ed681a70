"""Avro schema resolution (operators/avro.py, r12): reading era-1
shards under an evolved era-2 reader schema — promotions, field and
record-name aliases, defaults, enum re-matching, union re-resolution —
cross-validated against org.apache.avro's own resolving
GenericDatumReader(writer, reader) on Spark's classpath."""

from __future__ import annotations

import json
import os

import pytest

from etl_pipeline_old_spark.operators.avro import (
    default_value,
    read_avro,
    write_avro,
)

_W12 = json.dumps({
    "type": "record", "name": "doc", "fields": [
        {"name": "doc_id", "type": "int"},
        {"name": "title", "type": "string"},
        {"name": "legacy", "type": "string"},
        {"name": "kind", "type": {
            "type": "enum", "name": "k", "symbols": ["A", "B", "OLD"]}},
        {"name": "score", "type": "float"},
        {"name": "extra", "type": ["null", "int"]},
    ],
})
_R12 = json.dumps({
    "type": "record", "name": "doc", "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "name", "type": "string", "aliases": ["title"]},
        {"name": "kind", "type": {
            "type": "enum", "name": "k", "symbols": ["A", "B"],
            "default": "A"}},
        {"name": "score", "type": "double"},
        {"name": "lang", "type": "string", "default": "und"},
        {"name": "tags", "type": {"type": "array", "items": "string"},
         "default": ["t0"]},
        {"name": "extra", "type": ["null", "long", "string"],
         "default": None},
    ],
})
_W12_RECS = [
    {"doc_id": 7, "title": "первый", "legacy": "drop me",
     "kind": "B", "score": 1.5, "extra": None},
    {"doc_id": -3, "title": "two", "legacy": "x",
     "kind": "OLD", "score": -2.25, "extra": 41},
]
_R12_EXPECT = [
    {"doc_id": 7, "name": "первый", "kind": "B", "score": 1.5,
     "lang": "und", "tags": ["t0"], "extra": None},
    {"doc_id": -3, "name": "two", "kind": "A", "score": -2.25,
     "lang": "und", "tags": ["t0"], "extra": 41},
]


def test_resolution_promotes_renames_defaults_and_skips():
    blob = write_avro(_W12_RECS, _W12, codec="deflate")
    wschema, _codec, recs = read_avro(blob, reader_schema_json=_R12)
    assert json.loads(wschema) == json.loads(_W12)  # provenance kept
    assert recs == _R12_EXPECT
    assert isinstance(recs[0]["doc_id"], int)
    assert isinstance(recs[0]["score"], float)


def test_resolution_reader_field_without_default_is_loud():
    r = json.loads(_R12)
    r["fields"].append({"name": "mandatory", "type": "string"})
    with pytest.raises(ValueError, match="carries no default"):
        read_avro(write_avro(_W12_RECS, _W12),
                  reader_schema_json=json.dumps(r))


def test_resolution_enum_without_default_is_loud():
    r = json.loads(_R12)
    del r["fields"][2]["type"]["default"]
    with pytest.raises(ValueError, match="enum symbol 'OLD'"):
        read_avro(write_avro(_W12_RECS, _W12),
                  reader_schema_json=json.dumps(r))


def test_resolution_string_bytes_both_ways_and_union_rematch():
    w = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "string"},
        {"name": "b", "type": "bytes"},
        {"name": "u", "type": ["null", "int"]},
    ]})
    r = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "bytes"},
        {"name": "b", "type": "string"},
        {"name": "u", "type": ["string", "long", "null"]},
    ]})
    blob = write_avro(
        [{"a": "héllo", "b": "héllo".encode("utf-8"), "u": 9}], w)
    _s, _c, recs = read_avro(blob, reader_schema_json=r)
    assert recs == [
        {"a": "héllo".encode("utf-8"), "b": "héllo", "u": 9}
    ]


def test_resolution_incompatible_types_are_loud():
    w = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "double"}]})
    r = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "int"}]})
    with pytest.raises(ValueError, match="does not resolve"):
        read_avro(write_avro([{"a": 1.0}], w), reader_schema_json=r)


def test_resolution_record_name_alias():
    w = json.dumps({"type": "record", "name": "OldDoc", "fields": [
        {"name": "a", "type": "int"}]})
    r_ok = json.dumps({"type": "record", "name": "NewDoc",
                       "aliases": ["OldDoc"], "fields": [
                           {"name": "a", "type": "int"}]})
    r_bad = json.dumps({"type": "record", "name": "NewDoc", "fields": [
        {"name": "a", "type": "int"}]})
    blob = write_avro([{"a": 4}], w)
    assert read_avro(blob, reader_schema_json=r_ok)[2] == [{"a": 4}]
    with pytest.raises(ValueError, match="does not match reader record"):
        read_avro(blob, reader_schema_json=r_bad)


def test_default_value_encoding_table():
    # bytes defaults are JSON strings of codepoints 0-255 (latin-1)
    assert default_value("bytes", "ÿ") == b"\x01\xff"
    assert default_value(["null", "int"], None) is None
    assert default_value({"type": "array", "items": "long"}, [1, 2]) == [1, 2]
    assert default_value(
        {"type": "record", "name": "n", "fields": [
            {"name": "x", "type": "int"},
            {"name": "y", "type": "string", "default": "d"}]},
        {"x": 3},
    ) == {"x": 3, "y": "d"}


def test_java_resolving_decoder_agrees(spark, tmp_path):
    """The era-2 read of an era-1 shard must agree value-for-value with
    org.apache.avro's own resolving GenericDatumReader(writer, reader)."""
    jvm = spark.sparkContext._jvm
    path = os.path.join(str(tmp_path), "era1.avro")
    with open(path, "wb") as fh:
        fh.write(write_avro(_W12_RECS, _W12, codec="deflate"))
    wsch = jvm.org.apache.avro.Schema.Parser().parse(_W12)
    rsch = jvm.org.apache.avro.Schema.Parser().parse(_R12)
    reader = jvm.org.apache.avro.generic.GenericDatumReader(wsch, rsch)
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), reader
    )
    jgot = []
    while dfr.hasNext():
        rec = dfr.next()
        extra = rec.get("extra")
        jgot.append({
            "doc_id": rec.get("doc_id"),
            "name": str(rec.get("name")),
            "kind": str(rec.get("kind")),
            "score": float(rec.get("score")),
            "lang": str(rec.get("lang")),
            "tags": [str(x) for x in rec.get("tags")],
            "extra": int(extra) if extra is not None else None,
        })
    dfr.close()
    assert jgot == _R12_EXPECT
    with open(path, "rb") as fh:
        _s, _c, ours = read_avro(fh.read(), reader_schema_json=_R12)
    assert ours == jgot


def test_we_resolve_java_written_era1_files(spark, tmp_path):
    """Shards written by org.apache.avro under the era-1 schema must
    resolve identically under our reader schema."""
    jvm = spark.sparkContext._jvm
    jschema = jvm.org.apache.avro.Schema.Parser().parse(_W12)
    kschema = jschema.getField("kind").schema()
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    path = os.path.join(str(tmp_path), "java_era1.avro")
    dfw.create(jschema, jvm.java.io.File(path))
    for rec in _W12_RECS:
        jr = jvm.org.apache.avro.generic.GenericData.Record(jschema)
        jr.put("doc_id", rec["doc_id"])
        jr.put("title", rec["title"])
        jr.put("legacy", rec["legacy"])
        jr.put("kind", jvm.org.apache.avro.generic.GenericData.EnumSymbol(
            kschema, rec["kind"]))
        jr.put("score", rec["score"])
        jr.put("extra", rec["extra"])
        dfw.append(jr)
    dfw.close()
    with open(path, "rb") as fh:
        _s, _c, ours = read_avro(fh.read(), reader_schema_json=_R12)
    assert ours == _R12_EXPECT
