"""Executor-parallel append sink via the Python DataSource WRITER API.

Upgrades the K6 Google-Sheets anti-join upsert
(/root/reference/datasets/create_gitlab_dataset.ipynb:96-123, driver-side
``append_row`` per row) to a Spark 4 ``DataSource.writer``: each executor
partition batches its rows through one transport call, so the append
scales with partitions instead of serializing through the driver. The
transport is injectable exactly like ``sources/sheets.py`` — a gspread
(or any HTTP) client plugs in on a real deployment; tests use a
filesystem transport.

Delivery semantics (documented, not hidden): a sheet-style append API is
not transactional, so a retried task can append its batch twice WITHIN a
job — identical to the reference's behavior on a crashed loop. The K6
flow's anti-join pre-filter makes re-RUNS idempotent (already-present
keys are skipped), which is the same guarantee the reference relies on.
For exactly-once within a job, write to a staging location and have
``commit`` publish (the ``file`` transport shows the staging shape).
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass
from importlib import import_module

from pyspark.sql import DataFrame
from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage
from pyspark.sql.types import StructType

FORMAT_NAME = "sheet_append"


@dataclass
class SheetCommit(WriterCommitMessage):
    n_rows: int
    token: str


def _resolve_factory(dotted: str):
    mod, _, attr = dotted.rpartition(".")
    return getattr(import_module(mod), attr)


def file_transport_factory(options: dict):
    """Test/offline transport: append batches as JSON-lines files under
    ``options['path']``. One file per write() call, named by a fresh uuid
    — the staging shape a commit-publishing transport would finalize."""
    path = options["path"]

    class _FileTransport:
        def append_rows(self, rows: list[list]) -> str:
            os.makedirs(path, exist_ok=True)
            token = uuid.uuid4().hex
            tmp = os.path.join(path, f".part-{token}.jsonl.tmp")
            with open(tmp, "w", encoding="utf-8") as fh:
                for r in rows:
                    fh.write(json.dumps(r, ensure_ascii=False, default=str) + "\n")
            final = os.path.join(path, f"part-{token}.jsonl")
            os.rename(tmp, final)
            return token

    return _FileTransport()


class SheetAppendWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                f"{FORMAT_NAME} is an append-only sink (sheet semantics); "
                "use mode('append')"
            )
        self.options = dict(options)
        self.schema = schema

    # runs on EXECUTORS, one call per partition
    def write(self, iterator: Iterator) -> SheetCommit:
        transport = _resolve_factory(self.options["transport_factory"])(self.options)
        rows = [list(row) for row in iterator]
        token = transport.append_rows(rows) if rows else ""
        return SheetCommit(n_rows=len(rows), token=token)

    # driver-side: all partitions succeeded
    def commit(self, messages) -> None:
        total = sum(m.n_rows for m in messages if m is not None)
        self.options["_committed_rows"] = total  # observable via logs/tests

    def abort(self, messages) -> None:
        # sheet appends cannot be unwound; a staging transport would delete
        # its uncommitted files here
        pass


class SheetAppendDataSource(DataSource):
    """``df.write.format('sheet_append').option('transport_factory', ...)``"""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def writer(self, schema: StructType, overwrite: bool) -> SheetAppendWriter:
        return SheetAppendWriter(self.options, schema, overwrite)


def register(spark) -> None:
    spark.dataSource.register(SheetAppendDataSource)


def append_missing_distributed(
    df_new: DataFrame,
    existing_keys: DataFrame,
    on: str,
    **options: str,
) -> None:
    """K6 flow, executor-parallel: anti-join away already-present keys,
    then append the novelty set through the writer data source — no
    driver-side collect (contrast ``sinks.incremental.sheet_append_missing``,
    kept as the reference-faithful driver-side variant)."""
    spark = df_new.sparkSession
    register(spark)
    missing = df_new.join(existing_keys, on, "left_anti")
    w = missing.write.format(FORMAT_NAME).mode("append")
    for k, v in options.items():
        w = w.option(k, v)
    w.save()
