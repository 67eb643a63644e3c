"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API).

The reference's only external source is the Cohere embedding HTTP API
(app/utils/embedding.py:23-63) — a row-generating side service the engine
pulls from.  This module re-expresses "pluggable external source" the
Spark-native way: a DataSource subclass that plans explicit input
partitions (so a 1000-executor cluster fans the pull out) and reads each
partition independently and deterministically.

Two halves:

- ``SyntheticDocsSource`` (format name ``synthdocs``): seeded synthetic
  corpus generator with the driver ``documents`` schema.  Each partition
  derives its rows from (seed, doc_id) alone — no cross-partition state,
  no driver bottleneck, identical output at any parallelism.  Stands in
  for any record-pulling connector (REST page ranges, key ranges of an
  external store); swap `read` internals, keep the partition planning.
- ``JsonLinesSink`` via ``SyntheticDocsSource.writer``: the matching
  write path — each task writes one JSONL shard and reports a commit
  message; the driver-side ``commit`` sees every shard (the two-phase
  contract Spark uses for exactly-once batch sinks).
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_WORDS = (
    "spark shuffle join scan sort hash merge batch stream window "
    "vector index bucket probe filter page cache spill codegen plan"
).split()


def _doc_text(seed: int, doc_id: int) -> str:
    # per-row determinism: every token derived from sha256(seed, doc_id, i)
    h = hashlib.sha256(f"{seed}:{doc_id}".encode()).digest()
    n_tokens = 8 + h[0] % 25
    toks = []
    for i in range(n_tokens):
        hi = hashlib.sha256(f"{seed}:{doc_id}:{i}".encode()).digest()
        toks.append(_WORDS[hi[0] % len(_WORDS)])
    return " ".join(toks)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", "1000"))
        self.num_partitions = int(options.get("partitions", "8"))
        self.seed = int(options.get("seed", "42"))

    def partitions(self):
        per = -(-self.rows // self.num_partitions)  # ceil
        return [
            _RangePartition(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _RangePartition):
        langs = ("en", "de", "fr", "es")
        sources = ("src0", "src1", "src2", "src3")
        for doc_id in range(partition.start, partition.end):
            h = hashlib.sha256(f"{self.seed}:{doc_id}:meta".encode()).digest()
            text = _doc_text(self.seed, doc_id)
            yield (doc_id, text, langs[h[0] % 4], sources[h[1] % 4], len(text))


class _JsonLinesWriter(DataSourceWriter):
    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("synthdocs writer requires option 'path'")
        self.cols = schema.fieldNames()

    def write(self, rows) -> WriterCommitMessage:
        # One shard per task, named by partition index so two tasks with
        # identical content (e.g. two empty partitions) never collide and
        # the manifest never double-lists a file.  Write to a temp name
        # owned by this attempt, then atomically rename — a speculative
        # duplicate attempt can't interleave bytes with the winner.
        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        tc = TaskContext.get()
        part_id = tc.partitionId() if tc is not None else os.getpid()
        attempt = tc.taskAttemptId() if tc is not None else 0
        n = 0
        lines = []
        for row in rows:
            lines.append(json.dumps(dict(zip(self.cols, row))))
            n += 1
        digest = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:8]
        fname = os.path.join(self.path, f"part-{part_id:05d}-{digest}-{n}.jsonl")
        tmp = f"{fname}.attempt-{attempt}.tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(lines))
        os.replace(tmp, fname)
        msg = WriterCommitMessage()
        msg.file = fname  # type: ignore[attr-defined]
        msg.count = n  # type: ignore[attr-defined]
        return msg

    def commit(self, messages):
        manifest = {
            "files": sorted(m.file for m in messages if m is not None),
            "rows": sum(m.count for m in messages if m is not None),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class SyntheticDocsSource(DataSource):
    """format("synthdocs"): partition-planned deterministic corpus source
    with a two-phase-commit JSONL sink."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, source string, n_chars bigint"

    def reader(self, schema) -> DataSourceReader:
        return _SynthDocsReader(self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _JsonLinesWriter(self.options, schema)


def register_synthdocs(spark) -> None:
    spark.dataSource.register(SyntheticDocsSource)
