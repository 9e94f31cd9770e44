"""Custom Python DataSource WRITER: transactional JSON-lines sink.

Completes the custom-connector surface (the batch reader + streaming
reader live in sources/generator.py): ``df.write.format("jsonl_sink")``
writes one JSON-lines file per partition through the Spark 4 Python
``DataSourceWriter`` commit protocol —

- each task writes to a UUID-staged file and returns a
  ``WriterCommitMessage`` naming it;
- ``commit`` publishes by renaming every staged file into the target and
  writing a ``_SINK_COMMIT`` manifest listing the published files — a
  reader that honors the manifest never sees a partially-written job;
- ``abort`` deletes the staged files, so failed/speculative tasks leave
  nothing visible.

That is the same stage-then-publish discipline the engine's parquet
sinks and snapshot manifests use, here demonstrated at the connector
API level (the reference's write side is Iceberg commit semantics —
``bronze_to_silver.py`` relies on table-format atomicity; a custom sink
must provide its own, and this is the minimal correct shape).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

_MANIFEST = "_SINK_COMMIT"


@dataclass
class _Staged(WriterCommitMessage):
    staged_path: str
    n_rows: int


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires a 'path' option")

    def write(self, rows):
        os.makedirs(os.path.join(self.path, "_staging"), exist_ok=True)
        staged = os.path.join(self.path, "_staging", f"{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w") as fh:
            for row in rows:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _Staged(staged_path=staged, n_rows=n)

    def commit(self, messages):
        published = []
        for m in messages:
            final = os.path.join(self.path, os.path.basename(m.staged_path))
            os.replace(m.staged_path, final)
            published.append(
                {"file": os.path.basename(final), "n_rows": m.n_rows}
            )
        tmp = os.path.join(self.path, _MANIFEST + ".tmp")
        with open(tmp, "w") as fh:
            json.dump({"files": published}, fh)
        os.replace(tmp, os.path.join(self.path, _MANIFEST))

    def abort(self, messages):
        for m in messages:
            try:
                os.remove(m.staged_path)
            except OSError:
                pass


class JsonlSinkSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkSource)


def read_committed(spark, path: str):
    """Read back ONLY the files the commit manifest published — staged or
    orphaned files from failed jobs are invisible."""
    with open(os.path.join(path, _MANIFEST)) as fh:
        manifest = json.load(fh)
    files = [os.path.join(path, f["file"]) for f in manifest["files"]]
    return spark.read.text(files) if files else None
