"""Shared HTTP transport for the external embedder/sink clients
(SURVEY.md §2.1 E1/K1/K2 external half; NEXT.md hardening item).

The reference opens one fresh HTTPS connection per document
(`vectrekker/main.py:172-185` — sequential SDK calls, no reuse, no
backpressure handling). At Spark scale the same naivety multiplies: 1000
executors x thousands of micro-batches means TCP+TLS setup per request and,
when the endpoint goes down, every task burning its full retry schedule per
batch. This module fixes both:

- `PooledHttpClient` — one persistent keep-alive connection per client
  instance (clients are task-local, built by a factory inside the worker, so
  a connection is never serialized or shared across tasks). A stale pooled
  socket (server closed between requests) is re-dialed once, transparently;
  a reset on a FRESH connection propagates to the caller's retry loop so
  injected/real outages still back off.
- `CircuitBreaker` — consecutive-failure trip wire. After `threshold`
  failures the circuit opens and calls fail fast with `CircuitOpenError`
  for `cooldown_s` (no request, no sleep), then one half-open trial is let
  through; success closes the circuit. This bounds the damage of a dead
  endpoint: tasks fail in O(threshold) requests instead of
  O(batches x max_retries), and Spark's task retry/alerting takes over.
- `retry_delay` — exponential backoff that honors a server's `Retry-After`
  (seconds form) and caps hostile values. Shared by both clients.
"""

from __future__ import annotations

import http.client
import json
import time
import urllib.error
import urllib.parse
import urllib.request


def retry_delay(
    err: BaseException | None, backoff_s: float, attempt: int, cap_s: float = 60.0
) -> float:
    """Exponential-backoff delay for attempt N, raised to the server's
    ``Retry-After`` (seconds form) when the error carries one — a 429's
    explicit budget always wins over a shorter local guess. Capped so a
    hostile/buggy header can't stall a task for minutes."""
    delay = backoff_s * (2**attempt)
    if isinstance(err, urllib.error.HTTPError) and err.headers is not None:
        v = err.headers.get("Retry-After")
        if v:
            try:
                delay = max(delay, float(v))
            except ValueError:
                pass  # HTTP-date form: fall back to local backoff
    return min(delay, cap_s)


class CircuitOpenError(RuntimeError):
    """Raised instead of making a request while the circuit is open."""


class CircuitBreaker:
    """Consecutive-failure circuit breaker (closed -> open -> half-open).

    Worker-local by construction (lives inside a task-local client); no
    locking needed. `clock` is injectable for deterministic tests.
    """

    def __init__(
        self, threshold: int = 8, cooldown_s: float = 30.0, clock=time.monotonic
    ) -> None:
        if threshold < 1:
            raise ValueError("threshold must be >= 1")
        self.threshold = threshold
        self.cooldown_s = cooldown_s
        self._clock = clock
        self._failures = 0
        self._opened_at: float | None = None
        self._half_open_trial = False
        self._trial_at = 0.0

    def before_request(self) -> None:
        """Gate a request: no-op when closed; raises when open; lets one
        trial through per cooldown window when half-open. An admitted trial
        whose outcome is never recorded (an exception between the gate and
        record_*) expires after a further cooldown window, so the breaker
        can never wedge permanently open."""
        if self._opened_at is None:
            return
        now = self._clock()
        if now - self._opened_at < self.cooldown_s:
            raise CircuitOpenError(self._open_msg(now))
        if self._half_open_trial and now - self._trial_at < self.cooldown_s:
            raise CircuitOpenError(self._open_msg(now))
        self._half_open_trial = True  # admit one probe request
        self._trial_at = now

    def check_open(self) -> None:
        """Non-mutating gate: raise iff the circuit is open and inside its
        cooldown. Used by retry loops right after the opening failure, so a
        freshly-tripped breaker skips the backoff sleep entirely (fail fast
        means no request AND no sleep)."""
        if (
            self._opened_at is not None
            and self._clock() - self._opened_at < self.cooldown_s
        ):
            raise CircuitOpenError(self._open_msg(self._clock()))

    def _open_msg(self, now: float) -> str:
        elapsed = now - (self._opened_at or now)
        return (
            f"circuit open after {self._failures} consecutive failures; "
            f"retry in {max(0.0, self.cooldown_s - elapsed):.1f}s"
        )

    def record_success(self) -> None:
        self._failures = 0
        self._opened_at = None
        self._half_open_trial = False

    def record_failure(self) -> None:
        self._failures += 1
        self._half_open_trial = False
        if self._failures >= self.threshold:
            self._opened_at = self._clock()


class PooledHttpClient:
    """Keep-alive JSON POST client over one persistent connection.

    `post_json` returns the decoded JSON body on 2xx and raises
    `urllib.error.HTTPError` (headers attached, so `retry_delay` can read
    `Retry-After`) on any other status — same exception surface as the
    previous urlopen-based transport, so callers' retry loops are unchanged.
    Non-2xx responses are drained so the connection stays reusable.

    Delivery is AT-LEAST-ONCE on a reused connection: when a keep-alive
    socket dies mid-exchange the client cannot tell "server idled out the
    connection before the request arrived" from "server processed the
    request and the connection reset while we read the reply", and the
    transparent re-dial re-sends in both cases. Both shipped callers are
    safe under replay (vector upsert is idempotent by key; an embed request
    is repeatable — and the caller's own retry loop would re-send anyway),
    but a non-idempotent endpoint must pass `idempotent=False`, which turns
    the stale-socket re-dial off and surfaces the failure to the caller.
    """

    def __init__(self, base_url: str, timeout_s: float = 30.0) -> None:
        u = urllib.parse.urlsplit(base_url)
        if u.scheme not in ("http", "https"):
            raise ValueError(f"unsupported scheme: {u.scheme!r}")
        self._scheme = u.scheme
        self._host = u.hostname or ""
        self._port = u.port
        self._base_path = u.path.rstrip("/")
        self._base_query = u.query  # e.g. Azure-style ?api-version=... — kept
        self.timeout_s = timeout_s
        self._conn: http.client.HTTPConnection | None = None
        self._used = False  # True once the live connection served a request
        # honor the same proxy env vars (http_proxy/https_proxy/no_proxy) the
        # previous urllib.request transport did — executors whose only egress
        # is a corporate proxy keep working
        proxies = urllib.request.getproxies()
        proxy = (
            None
            if urllib.request.proxy_bypass(self._host)
            else proxies.get(self._scheme)
        )
        self._proxy = urllib.parse.urlsplit(proxy) if proxy else None

    def _connect(self) -> http.client.HTTPConnection:
        if self._conn is None:
            cls = (
                http.client.HTTPSConnection
                if self._scheme == "https"
                else http.client.HTTPConnection
            )
            if self._proxy is not None:
                conn = cls(
                    self._proxy.hostname or "",
                    self._proxy.port,
                    timeout=self.timeout_s,
                )
                if self._scheme == "https":
                    # CONNECT tunnel through the proxy to the real host
                    conn.set_tunnel(self._host, self._port)
                self._conn = conn
            else:
                self._conn = cls(self._host, self._port, timeout=self.timeout_s)
            self._used = False
        return self._conn

    def close(self) -> None:
        if self._conn is not None:
            try:
                self._conn.close()
            finally:
                self._conn = None
                self._used = False

    def _target(self, path: str) -> str:
        """Request target: base path + path, with the base URL's query string
        merged in (after any query the path itself carries)."""
        target = f"{self._base_path}{path}"
        if self._base_query:
            target += ("&" if "?" in target else "?") + self._base_query
        return target

    def _url(self, path: str) -> str:
        netloc = self._host if self._port is None else f"{self._host}:{self._port}"
        return f"{self._scheme}://{netloc}{self._target(path)}"

    def post_json(
        self,
        path: str,
        payload: dict,
        headers: dict[str, str] | None = None,
        idempotent: bool = False,
    ) -> dict:
        # idempotent defaults FALSE: transparent stale-socket replay is an
        # at-least-once hazard, so each endpoint opts in explicitly (the two
        # shipped callers — embed + vector upsert — both document replay
        # safety and pass idempotent=True). A future non-idempotent caller
        # gets fail-fast semantics without having to know about the flag.
        body = json.dumps(payload).encode()
        hdrs = {"Content-Type": "application/json", **(headers or {})}
        try:
            resp = self._request(path, body, hdrs)
        except (http.client.HTTPException, ConnectionError, TimeoutError, OSError):
            was_reused = self._used
            self.close()
            if not (was_reused and idempotent):
                # fresh-connection failure is a real outage; a non-idempotent
                # request must not be replayed (at-least-once hazard — see
                # class docstring). Either way the caller decides.
                raise
            # stale keep-alive socket (server idled it out between requests):
            # one transparent re-dial, failures from here propagate
            resp = self._request(path, body, hdrs)
        data = resp.read()  # always drain: keeps the connection reusable
        self._used = True
        if not 200 <= resp.status < 300:
            self.close()  # don't trust reuse after an error response
            raise urllib.error.HTTPError(
                self._url(path), resp.status, resp.reason, resp.headers, None
            )
        return json.loads(data) if data else {}

    def _request(self, path: str, body: bytes, headers: dict[str, str]):
        conn = self._connect()
        # plain HTTP through a proxy needs the absolute URI as the target;
        # HTTPS tunnels via CONNECT and uses the origin-form target
        target = (
            self._url(path)
            if self._proxy is not None and self._scheme == "http"
            else self._target(path)
        )
        conn.request("POST", target, body=body, headers=headers)
        return conn.getresponse()
