"""External vector-store sink (SURVEY.md §2.1 K1/K2 "foreachPartition →
external store for true Pinecone parity").

The reference upserts one vector per HTTP call into a managed vector index
(`vectrekker/main.py:162-167,185`). The Spark-native index in this repo is
the parquet MERGE table (operators/delta.py); this module is the OTHER half
of K2 parity — pushing rows into an external store that Spark cannot write
as files. Generic protocol + a batched HTTP implementation; no
provider-specific code.

Scale shape: `write_to_sink` = `df.foreachPartition(...)`, so a
1000-executor cluster opens 1000 client connections, each batching
`batch_size` vectors per request (vs the reference's 1) — the sink's
ingest capacity, not Spark, becomes the bottleneck. Delivery is
at-least-once per partition (a failed task retries whole); pair with
id-keyed upsert semantics (which every vector store provides) for
effective idempotence, exactly like the reference's INSERT OR REPLACE.
"""

from __future__ import annotations

import time
import urllib.error
from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame

from vectrekker_spark.http_client import CircuitBreaker, PooledHttpClient, retry_delay


@runtime_checkable
class VectorSink(Protocol):
    def create_index_if_absent(self, name: str, dim: int, metric: str) -> None: ...

    def upsert(self, rows: list[tuple[str, list[float], dict]]) -> None: ...


class HttpVectorSink:
    """Batched JSON-over-HTTP sink: POST {"vectors":[{"id","values",
    "metadata"},...]} to `{base_url}/vectors/upsert`, DDL to
    `{base_url}/indexes` — the public request shape of managed vector
    stores. Bounded retry on 429/5xx, keep-alive pooled connection, and a
    fail-fast circuit breaker — same policy as HttpEmbedder."""

    RETRYABLE = {429, 500, 502, 503, 504}

    def __init__(
        self,
        base_url: str,
        max_retries: int = 5,
        backoff_s: float = 0.5,
        timeout_s: float = 30.0,
        api_key_env: str = "VECTOR_SINK_API_KEY",
        breaker_threshold: int = 8,
        breaker_cooldown_s: float = 30.0,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.timeout_s = timeout_s
        self.api_key_env = api_key_env
        self._client = PooledHttpClient(self.base_url, timeout_s=timeout_s)
        self._breaker = CircuitBreaker(breaker_threshold, breaker_cooldown_s)

    def close(self) -> None:
        self._client.close()

    def _post(self, path: str, payload: dict) -> dict:
        import http.client
        import os

        headers = {}
        key = os.environ.get(self.api_key_env, "")
        if key:
            headers["Authorization"] = f"Bearer {key}"

        attempt = 0
        while True:
            self._breaker.before_request()  # fail fast when the circuit is open
            try:
                # idempotent=True: upsert-by-id replays harmlessly
                # (documented at-least-once contract of the sink)
                out = self._client.post_json(path, payload, headers, idempotent=True)
                self._breaker.record_success()
                return out
            except urllib.error.HTTPError as e:
                self._breaker.record_failure()
                if e.code not in self.RETRYABLE or attempt >= self.max_retries:
                    raise
                err: BaseException = e
            except (
                urllib.error.URLError,
                http.client.HTTPException,
                TimeoutError,
                ConnectionError,
                OSError,
            ) as e:
                self._breaker.record_failure()
                if attempt >= self.max_retries:
                    raise
                err = e
            # fail fast on a freshly-tripped breaker: no sleep, no request
            self._breaker.check_open()
            time.sleep(retry_delay(err, self.backoff_s, attempt))
            attempt += 1

    def create_index_if_absent(self, name: str, dim: int, metric: str) -> None:
        # idempotent on the server side (create-if-absent DDL, K1 semantics)
        self._post("/indexes", {"name": name, "dimension": dim, "metric": metric})

    def upsert(self, rows: list[tuple[str, list[float], dict]]) -> None:
        self._post(
            "/vectors/upsert",
            {
                "vectors": [
                    {"id": i, "values": v, "metadata": m} for i, v, m in rows
                ]
            },
        )


def write_to_sink(
    df: DataFrame,
    sink_factory,
    id_col: str = "id",
    vec_col: str = "embedding",
    meta_col: str | None = "metadata",
    batch_size: int = 100,
) -> None:
    """Upsert (id, vector, metadata) rows into an external store, one batched
    client per partition.

    `sink_factory` is a zero-arg picklable callable returning a VectorSink;
    it runs inside each executor task (connections are never serialized).
    At-least-once delivery — rely on the store's id-keyed upsert for
    idempotence.
    """

    def push(rows) -> None:
        sink: VectorSink = sink_factory()
        try:
            batch: list[tuple[str, list[float], dict]] = []
            for r in rows:
                meta = dict(r[meta_col]) if meta_col and r[meta_col] is not None else {}
                batch.append((r[id_col], list(r[vec_col]), meta))
                if len(batch) >= batch_size:
                    sink.upsert(batch)
                    batch = []
            if batch:
                sink.upsert(batch)
        finally:
            # release the pooled keep-alive socket when the task ends
            getattr(sink, "close", lambda: None)()

    cols = [id_col, vec_col] + ([meta_col] if meta_col else [])
    df.select(*cols).foreachPartition(push)
