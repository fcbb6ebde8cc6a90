"""A continuous-extraction feed as a PySpark Python STREAMING Data
Source (the Structured Streaming twin of the batch REST source in
``airflow_rest.py`` — where the reference's extraction is a driver-side
offset loop re-run per DAG interval, the Spark-4-native restatement is
a ``DataSourceStreamReader`` whose offsets ARE the page cursor).

The feed is deterministic-synthetic (no crawler in this container, the
same stance as the REST source's fixture branch): batch ``b`` holds
``rows_per_batch`` documents with ``doc_id = b·R + i`` and
``text = md5('crawl|' || doc_id)`` — md5 so the DuckDB oracle can
regenerate the exact payload and value-check everything downstream of
the source. The STRUCTURE is the real surface being exercised:

- ``initialOffset``/``latestOffset`` drive the micro-batch cursor
  (``n_batches`` advances per poll, capped at ``max_batches``),
- ``partitions(start, end)`` fans each offset window into one
  InputPartition per batch — executors read pages in parallel, the
  same pages-as-partitions shape as the batch REST source,
- ``read(partition)`` generates rows executor-side (zero driver I/O),
- ``commit`` is the no-op a replayable feed affords.

At 100 TB the generator body is the only thing that changes: a real
crawl frontier hands out (shard, cursor) windows; offsets stay tiny
dicts and rows never touch the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


def crawl_row(doc_id: int) -> tuple[int, str]:
    """The deterministic payload contract — single-sourced so tests,
    the stream reader, and documentation agree; the DuckDB twin is
    ``md5('crawl|' || CAST(doc_id AS VARCHAR))``."""
    return doc_id, hashlib.md5(f"crawl|{doc_id}".encode()).hexdigest()


class _BatchPartition(InputPartition):
    def __init__(self, batch: int, rows: int):
        self.batch = batch
        self.rows = rows


class CrawlFeedStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_batches = int(options.get("max_batches", 5))
        self.batches_per_poll = int(options.get("batches_per_poll", 2))
        self._cursor = 0

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def latestOffset(self) -> dict:
        self._cursor = min(
            self._cursor + self.batches_per_poll, self.max_batches
        )
        return {"batch": self._cursor}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        return [
            _BatchPartition(b, self.rows_per_batch)
            for b in range(start["batch"], end["batch"])
        ]

    def read(self, partition: _BatchPartition) -> Iterator[tuple]:
        base = partition.batch * partition.rows
        for i in range(partition.rows):
            doc_id, text = crawl_row(base + i)
            yield (doc_id, partition.batch, text)

    def commit(self, end: dict) -> None:
        pass  # replayable feed: nothing to acknowledge


class CrawlFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "crawl_feed"

    def schema(self) -> str:
        return "doc_id bigint, batch int, text string"

    def streamReader(self, schema: StructType) -> CrawlFeedStreamReader:
        return CrawlFeedStreamReader(self.options)
