"""Airflow REST extraction as a PySpark Python Data Source (S1-S3).

The reference extracts entities from the Airflow REST API with a
driver-side offset loop (``airflow_to_gcs.py:260-293``: ``page_limit``/
``page_offset`` batches, one JSON file per page, with the §0 bug that
``taskInstances`` only ever fetches page one). The Spark-native
restatement is a custom batch source whose **input partitions are the
pages**: Spark schedules one task per page, each task fetches ONLY its
page (server-side ``limit``/``offset``), so pagination runs in parallel
across executors and full pagination holds by construction.

Endpoint forms for ``path``:

- ``http(s)://...`` — a live Airflow base URL. Planning probes
  ``total_entries`` with a ``limit=1`` request; each task GETs its own
  ``?limit=&offset=`` window (stdlib urllib, 30 s timeout). Collection
  payload keys are the API's snake_case form (``dag_runs``,
  ``task_instances``, ``dags``). Consistency caveat: like the
  reference's offset loop, pages are separate snapshots — rows inserted
  between tasks can shift page boundaries. The engine's downstream
  watermark + PK dedup (operators/incremental.py) absorbs exactly this
  class of duplicate/late row, which is why the pipeline composes them.
- a local JSON fixture (an array of entity objects) — used by tests and
  the driver harness (no Airflow in this container). Each task re-reads
  the fixture and slices its page client-side; fine for test-sized
  fixtures, not a production path.

Schema projection (P1) happens per-batch on the worker; extra API
fields are dropped, missing declared fields surface as NULL.
"""

from __future__ import annotations

import json
import math
import re
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

DEFAULT_BATCH_SIZE = 1000  # airflow_to_gcs.py:89
HTTP_TIMEOUT_S = 30


def _snake(entity: str) -> str:
    """API payload key for a collection: dagRuns → dag_runs."""
    return re.sub(r"(?<!^)(?=[A-Z])", "_", entity).lower()


def _http_get_json(url: str) -> dict | list:
    from urllib.request import urlopen

    with urlopen(url, timeout=HTTP_TIMEOUT_S) as r:  # noqa: S310
        return json.loads(r.read().decode("utf-8"))


def _http_page(path: str, entity: str, offset: int, limit: int) -> list[dict]:
    body = _http_get_json(
        f"{path}/api/v1/{entity}?limit={limit}&offset={offset}"
    )
    return body.get(_snake(entity), []) if isinstance(body, dict) else body


def _http_total(path: str, entity: str) -> int:
    body = _http_get_json(f"{path}/api/v1/{entity}?limit=1")
    if isinstance(body, dict) and "total_entries" in body:
        return int(body["total_entries"])
    return len(body) if isinstance(body, list) else 0


def _fixture_rows(path: str) -> list[dict]:
    with open(path, encoding="utf-8") as f:
        return json.load(f)


class _Page(InputPartition):
    def __init__(self, offset: int, limit: int):
        self.offset = offset
        self.limit = limit


class AirflowRestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options["path"]
        self.entity = options.get("entity", "dagRuns")
        self.batch_size = int(options.get("batch_size", DEFAULT_BATCH_SIZE))
        self._is_http = self.path.startswith(("http://", "https://"))

    def partitions(self) -> list[InputPartition]:
        # planning-time probe = the API's total_entries (A3); one
        # partition per page — the reference's offset loop, parallelized
        if self._is_http:
            total = _http_total(self.path, self.entity)
        else:
            total = len(_fixture_rows(self.path))
        n_pages = max(1, math.ceil(total / self.batch_size))
        return [
            _Page(i * self.batch_size, self.batch_size) for i in range(n_pages)
        ]

    def read(self, partition: _Page) -> Iterator[tuple]:
        if self._is_http:
            rows = _http_page(
                self.path, self.entity, partition.offset, partition.limit
            )
        else:
            rows = _fixture_rows(self.path)[
                partition.offset : partition.offset + partition.limit
            ]
        names = [f.name for f in self.schema.fields]
        for row in rows:
            # P1 projection: exactly the declared fields; missing → None
            yield tuple(row.get(n) for n in names)


class AirflowRestDataSource(DataSource):
    """``spark.read.format("airflow_rest")`` — register with
    ``spark.dataSource.register(AirflowRestDataSource)``. Requires an
    explicit schema (the engine's catalog decides types, §1.2 — no
    inference)."""

    @classmethod
    def name(cls) -> str:
        return "airflow_rest"

    def schema(self):
        raise NotImplementedError(
            "airflow_rest requires an explicit .schema(...) — the engine "
            "catalog (schemas.py) is the source of truth, not inference"
        )

    def reader(self, schema: StructType) -> AirflowRestReader:
        return AirflowRestReader(schema, self.options)
