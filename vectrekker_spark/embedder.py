"""Pluggable embedder interface (SURVEY.md §2.1 E1, §4.2 "Embed-call
batching & rate limiting — ours").

The reference embeds one document per synchronous HTTP call inside its
per-file loop (`vectrekker/main.py:180-183`) — a ~1/RTT docs/s ceiling. Here
the embedder is a protocol with two implementations:

- `HashingEmbedder` — the deterministic seeded hashing-trick embedder
  (SURVEY.md §5.3); used by every test and oracle query. No network.
- `HttpEmbedder` — a batched, rate-limited, retrying client for any
  OpenAI-compatible `/embeddings` endpoint (a public, widely-implemented
  request/response shape: POST {"model","input":[...]} →
  {"data":[{"embedding":[...]},...]}). NEVER constructed in the test path;
  tests exercise it only against a local fake server.

`embed_column` runs any Embedder inside `mapInPandas`: per-partition
micro-batches (vs the reference's per-file calls), so a 1000-executor
cluster issues 1000 concurrent batched streams, each throttled by
`min_interval_s`, and a worker-local embedder instance amortizes
connection setup across batches.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.parse
from collections.abc import Iterator
from typing import Protocol, runtime_checkable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from vectrekker_spark.http_client import (  # noqa: F401  (re-export: public API)
    CircuitBreaker,
    CircuitOpenError,
    PooledHttpClient,
    retry_delay,
)


@runtime_checkable
class Embedder(Protocol):
    """text batch → one fixed-dimension vector per text."""

    dim: int

    def embed_batch(self, texts: list[str]) -> list[list[float]]: ...


class HashingEmbedder:
    """Deterministic local embedder (no I/O) — the test/oracle implementation."""

    def __init__(self, dim: int = 64) -> None:
        self.dim = dim

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        from vectrekker_spark.queries.vector import hash_embed_batch

        return list(hash_embed_batch(pd.Series(texts), dim=self.dim))


class HttpEmbedder:
    """Batched HTTP embedder for an OpenAI-compatible `/embeddings` endpoint.

    vs the reference's loop (`vectrekker/main.py:172-185`): `batch_size`
    texts per request instead of 1, bounded exponential-backoff retry on
    429/5xx/connection errors instead of crashing, a per-client minimum
    request interval as the rate limit, one keep-alive pooled connection
    reused across batches (`PooledHttpClient`), and a circuit breaker that
    fails fast after `breaker_threshold` consecutive request failures so a
    dead endpoint costs O(threshold) requests per task, not
    O(batches x max_retries). Generic `endpoint_url` — no provider-specific
    code; the API key comes from an env var named by `api_key_env` so
    credentials never live in job code.
    """

    RETRYABLE = {429, 500, 502, 503, 504}

    def __init__(
        self,
        endpoint_url: str,
        dim: int,
        model: str = "",
        batch_size: int = 64,
        max_retries: int = 5,
        backoff_s: float = 0.5,
        min_interval_s: float = 0.0,
        timeout_s: float = 30.0,
        api_key_env: str = "EMBED_API_KEY",
        breaker_threshold: int = 8,
        breaker_cooldown_s: float = 30.0,
    ) -> None:
        u = urllib.parse.urlsplit(endpoint_url)
        self.endpoint_url = endpoint_url
        self.dim = dim
        self.model = model
        self.batch_size = batch_size
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.min_interval_s = min_interval_s
        self.timeout_s = timeout_s
        self.api_key_env = api_key_env
        # keep any query string (e.g. Azure-style ?api-version=...) on the path
        self._path = (u.path or "/") + (f"?{u.query}" if u.query else "")
        self._client = PooledHttpClient(
            f"{u.scheme}://{u.netloc}", timeout_s=timeout_s
        )
        self._breaker = CircuitBreaker(breaker_threshold, breaker_cooldown_s)
        self._last_request_t = 0.0

    def close(self) -> None:
        self._client.close()

    # -- one HTTP round trip (retry loop lives in embed_batch) --------------
    def _post(self, texts: list[str]) -> list[list[float]]:
        import os

        headers = {}
        key = os.environ.get(self.api_key_env, "")
        if key:
            headers["Authorization"] = f"Bearer {key}"
        # idempotent=True: re-embedding the same texts is safe (documented
        # at-least-once contract), so a stale keep-alive socket may replay
        payload = self._client.post_json(
            self._path, {"model": self.model, "input": texts}, headers,
            idempotent=True,
        )
        vecs = [row["embedding"] for row in payload["data"]]
        if len(vecs) != len(texts):
            raise ValueError(
                f"endpoint returned {len(vecs)} vectors for {len(texts)} inputs"
            )
        for v in vecs:
            if len(v) != self.dim:
                raise ValueError(f"expected dim {self.dim}, got {len(v)}")
        return vecs

    def _throttle(self) -> None:
        if self.min_interval_s > 0:
            wait = self._last_request_t + self.min_interval_s - time.monotonic()
            if wait > 0:
                time.sleep(wait)
        self._last_request_t = time.monotonic()

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        import http.client

        out: list[list[float]] = []
        for i in range(0, len(texts), self.batch_size):
            chunk = texts[i : i + self.batch_size]
            attempt = 0
            while True:
                self._breaker.before_request()  # fail fast when the circuit is open
                self._throttle()
                try:
                    out.extend(self._post(chunk))
                    self._breaker.record_success()
                    break
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
                    # covers connection resets: the server dropping the
                    # socket mid-exchange surfaces as RemoteDisconnected /
                    # ConnectionResetError from the pooled transport
                    self._breaker.record_failure()
                    if attempt >= self.max_retries:
                        raise
                    err = e
                # a failure that just tripped the breaker must not burn the
                # backoff sleep (possibly a 60 s Retry-After) before failing
                self._breaker.check_open()
                time.sleep(retry_delay(err, self.backoff_s, attempt))
                attempt += 1
        return out


def embed_column(
    df: DataFrame,
    embedder_factory,
    text_col: str = "text",
    out_col: str = "embedding",
    micro_batch: int = 256,
) -> DataFrame:
    """Append `out_col` = embedder(text) via mapInPandas.

    `embedder_factory` is a zero-arg picklable callable returning an
    Embedder; it runs ONCE per task inside the Python worker, so connection
    state/rate-limit clocks are worker-local (never serialized from the
    driver, never shared across executors).
    """
    fields = df.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.DoubleType()), True)
    ]
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        emb: Embedder = embedder_factory()
        try:
            for pdf in batches:
                for lo in range(0, len(pdf), micro_batch):
                    part = pdf.iloc[lo : lo + micro_batch].copy()
                    vecs = emb.embed_batch(part[text_col].tolist())
                    part[out_col] = pd.Series(list(vecs), index=part.index)
                    yield part
        finally:
            # release the pooled keep-alive socket when the task ends (Python
            # workers are reused — GC alone would leak idle connections)
            getattr(emb, "close", lambda: None)()

    return df.mapInPandas(run, out_schema)
