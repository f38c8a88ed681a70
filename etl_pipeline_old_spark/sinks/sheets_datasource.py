"""Executor-parallel append sink via the Python DataSource WRITER API.

Upgrades the K6 Google-Sheets anti-join upsert
(/root/reference/datasets/create_gitlab_dataset.ipynb:96-123, driver-side
``append_row`` per row) to a Spark 4 ``DataSource.writer``: each executor
partition batches its rows through one transport call, so the append
scales with partitions instead of serializing through the driver. The
transport is injectable exactly like ``sources/sheets.py`` — a gspread
(or any HTTP) client plugs in on a real deployment; tests use a
filesystem transport.

Delivery semantics: a transport that appends directly (a real sheet API)
is not transactional — a retried task can append its batch twice within a
job, identical to the reference's behavior on a crashed loop, and the K6
anti-join pre-filter is what keeps re-RUNS idempotent. A transport that
can STAGE gets exactly-once: ``write()`` stages each partition batch
under a fresh token, ``commit()`` publishes only the tokens returned in
the successful attempts' commit messages (a failed/retried attempt's
stage is never published), ``abort()`` discards. The ``file`` transport
implements the staged recipe and the tests assert publish-on-commit.
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
    """Test/offline transport implementing the STAGED recipe: write()
    stages a JSON-lines file per batch under a fresh token; publish()
    (driver, at commit) renames exactly the committed tokens final;
    discard() (driver, at abort) removes stages. A retried task's
    orphaned stage is never published."""
    path = options["path"]

    class _FileTransport:
        def append_rows(self, rows: list[list]) -> str:
            os.makedirs(path, exist_ok=True)
            token = uuid.uuid4().hex
            tmp = os.path.join(path, f".part-{token}.jsonl.tmp")
            with open(tmp, "w", encoding="utf-8") as fh:
                for r in rows:
                    fh.write(json.dumps(r, ensure_ascii=False, default=str) + "\n")
            return token

        def publish(self, tokens: list[str]) -> None:
            for token in tokens:
                tmp = os.path.join(path, f".part-{token}.jsonl.tmp")
                os.rename(tmp, os.path.join(path, f"part-{token}.jsonl"))

        def discard(self, tokens: list[str]) -> None:
            for token in tokens:
                tmp = os.path.join(path, f".part-{token}.jsonl.tmp")
                if os.path.exists(tmp):
                    os.remove(tmp)

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

    def _transport(self):
        return _resolve_factory(self.options["transport_factory"])(self.options)

    def _tokens(self, messages) -> list[str]:
        return [m.token for m in messages if m is not None and m.token]

    # driver-side: every partition succeeded exactly once -> publish those
    # attempts' stages (and only those; a retried attempt's stage stays dark)
    def commit(self, messages) -> None:
        transport = self._transport()
        if hasattr(transport, "publish"):
            transport.publish(self._tokens(messages))

    # driver-side: the job failed -> discard whatever was staged
    def abort(self, messages) -> None:
        transport = self._transport()
        if hasattr(transport, "discard"):
            transport.discard(self._tokens(messages))


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


def failing_transport_factory(options: dict):
    """Failure-injection transport for tests: behaves like the file
    transport but raises on any batch containing a row whose first field
    equals options['poison'] (as a string) — used to prove that a failed
    job publishes NOTHING (abort discards all stages)."""
    poison = options["poison"]
    inner = file_transport_factory(options)

    class _FailingTransport:
        def append_rows(self, rows: list[list]) -> str:
            if any(str(r[0]) == poison for r in rows):
                raise RuntimeError(f"injected failure on row {poison}")
            return inner.append_rows(rows)

        def publish(self, tokens: list[str]) -> None:
            inner.publish(tokens)

        def discard(self, tokens: list[str]) -> None:
            inner.discard(tokens)

    return _FailingTransport()
