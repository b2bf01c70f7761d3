"""External-resource fetch stage with SSRF protection (S6).

Transposes the reference's download path — ``helper/HttpConnector.java``
(pooled connections, size-capped ``downloadFile`` with redirect
re-validation) and ``helper/SsrfProtection.java:58-135``
(``isUrlAllowed`` / ``isHostAllowed``) — into a Ray actor-pool stage:

- :func:`is_url_allowed` is the REAL policy logic, decision-for-
  decision with the reference: http(s)-only schemes, optional
  prefix allowlist, and rejection of loopback / private / link-local
  / unspecified / multicast / metadata-endpoint hosts.  Host→address
  resolution is pluggable (``resolver``): this sandbox has no DNS, so
  the default resolves only literal IPv4/IPv6 hosts and lets symbolic
  hostnames pass the address checks (documented divergence — the
  reference rejects unresolvable hosts); tests inject a fake resolver
  to pin every rejection branch of the Java ``@should`` list.
- :class:`FetchDocs` is the fetcher: a callable CLASS for
  ``map_batches(..., concurrency=N)`` whose transport is a plugged
  function (``url -> bytes``).  There is deliberately NO default
  network transport in this environment; the deterministic fake used
  by tests/catalog exercises the real control flow — validation
  before I/O, size cap enforcement, per-actor TTL cache, hit/miss
  accounting.

Scale notes: fetching is I/O-bound — run it as an actor pool sized by
connection budget, not CPU (``concurrency=N, num_cpus=0.25``); the
TTL cache lives per actor (hot authority URLs repeat within a shard);
payload columns are opaque ``binary`` and batches must stay small
enough that ``batch_size × concurrency × max_bytes`` fits the heap.
"""

from __future__ import annotations

import base64
import hashlib
import ipaddress
import json
import os
import time
from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .enrich import TTLCache

__all__ = ["is_url_allowed", "host_addresses", "FetchDocs",
           "RecordedTransport", "PayloadTooLarge", "TransportError",
           "TransientFetchError", "robots_match"]


class TransportError(Exception):
    """Permanent fetch failure (unrecorded url / retries exhausted)."""


class TransientFetchError(Exception):
    """Retryable failure (the scripted connection-reset analog)."""


class PayloadTooLarge(Exception):
    """Raised MID-STREAM once the size cap is crossed — the download
    is aborted without reading the remaining body
    (``HttpConnector.downloadFile``'s bounded-stream copy, which stops
    at the cap instead of buffering the response)."""

    def __init__(self, url: str, bytes_read: int):
        super().__init__(f"{url}: aborted after {bytes_read} bytes")
        self.url = url
        self.bytes_read = bytes_read


class RecordedTransport:
    """Recorded-fixture HTTP transport (``helper/HttpConnector.java``
    behaviors without a network): responses are TAPES — JSON files
    under ``fixture_dir`` scripting the chunked response body and a
    number of leading transient failures.

    End-to-end behaviors exercised against :class:`FetchDocs`:

    - **retry with backoff**: each ``__call__`` retries transient
      failures up to ``max_retries`` times, sleeping
      ``backoff_s · 2^attempt`` between tries (injectable ``sleep``);
      a tape recorded with ``fail_times=n`` fails its first *n*
      request attempts, then serves the body.
    - **size-cap abort mid-stream**: the body is consumed chunk by
      chunk; crossing ``max_bytes`` raises :class:`PayloadTooLarge`
      immediately — remaining chunks are never read
      (``chunks_read`` exposes how far the stream got).  The abort is
      PERMANENT (not retried).
    - **cache TTL**: the transport counts real requests (``calls``),
      so tests can pin that :class:`FetchDocs`' per-actor TTL cache
      absorbs repeats and re-fetches after expiry.
    """

    def __init__(self, fixture_dir: str, *, max_retries: int = 3,
                 backoff_s: float = 0.05, max_bytes: int | None = None,
                 sleep: Callable[[float], None] | None = None):
        self.fixture_dir = fixture_dir
        os.makedirs(fixture_dir, exist_ok=True)
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.max_bytes = max_bytes
        self.sleep = sleep if sleep is not None else time.sleep
        self._attempts: dict[str, int] = {}
        self.calls = 0        # underlying request attempts (incl. failures)
        self.chunks_read = 0  # chunks consumed by the LAST request

    def _tape_path(self, url: str) -> str:
        name = hashlib.blake2b(url.encode(), digest_size=12).hexdigest()
        return os.path.join(self.fixture_dir, f"{name}.json")

    def record(self, url: str, chunks: list[bytes], *,
               fail_times: int = 0) -> None:
        """Write a tape: ``chunks`` is the response body as it would
        arrive on the wire; the first ``fail_times`` request attempts
        raise a transient error."""
        tape = {
            "url": url,
            "fail_times": int(fail_times),
            "chunks": [base64.b64encode(c).decode() for c in chunks],
        }
        with open(self._tape_path(url), "w") as f:
            json.dump(tape, f)

    def _request(self, url: str, tape: dict) -> bytes:
        seen = self._attempts.get(url, 0)
        self._attempts[url] = seen + 1
        if seen < tape["fail_times"]:
            raise TransientFetchError(f"{url}: scripted failure {seen + 1}")
        buf = bytearray()
        self.chunks_read = 0
        for c in tape["chunks"]:
            buf += base64.b64decode(c)
            self.chunks_read += 1
            if self.max_bytes is not None and len(buf) > self.max_bytes:
                raise PayloadTooLarge(url, len(buf))
        return bytes(buf)

    def __call__(self, url: str) -> bytes:
        p = self._tape_path(url)
        if not os.path.exists(p):
            raise TransportError(f"unrecorded url: {url}")
        with open(p) as f:
            tape = json.load(f)
        last: Exception | None = None
        for attempt in range(1 + self.max_retries):
            self.calls += 1
            try:
                return self._request(url, tape)
            except TransientFetchError as e:
                last = e
                if attempt < self.max_retries:
                    self.sleep(self.backoff_s * (2 ** attempt))
        raise TransportError(f"{url}: retries exhausted") from last


def host_addresses(host: str) -> list[str]:
    """Default resolver: literal IPs resolve to themselves; symbolic
    hostnames resolve to nothing (no DNS in this environment).

    Covers the LEGACY numeric forms too (``2130706433``, ``127.1``,
    ``0x7f000001``): ``inet_aton`` parses those without any DNS, so a
    real transport would reach loopback through them — they must hit
    the address checks, not slip past as "hostnames"."""
    h = host.strip("[]")
    try:
        ipaddress.ip_address(h)
        return [h]
    except ValueError:
        pass
    import socket

    try:
        return [socket.inet_ntoa(socket.inet_aton(h))]
    except OSError:
        return []


def _address_blocked(addr: str) -> bool:
    """The ``isHostAllowed`` per-address test: loopback, site-local,
    link-local (incl. the 169.254.169.254 metadata endpoint), any-local
    and multicast are all rejected (``SsrfProtection.java:104-126``)."""
    ip = ipaddress.ip_address(addr)
    return bool(
        ip.is_loopback
        or ip.is_private
        or ip.is_link_local
        or ip.is_unspecified
        or ip.is_multicast
    )


def is_url_allowed(
    url: str | None,
    allowed_prefixes: list[str] | None = None,
    *,
    resolver: Callable[[str], list[str]] = host_addresses,
) -> tuple[bool, str]:
    """``SsrfProtection.isUrlAllowed`` transposed; returns
    ``(allowed, reason)`` with reason ``""`` when allowed."""
    if not url or not url.strip():
        return False, "blank"
    if not (url.startswith("http://") or url.startswith("https://")):
        return False, "scheme"
    if allowed_prefixes:
        if not any(url.startswith(p) for p in allowed_prefixes):
            return False, "not_in_allowlist"
    # host extraction mirrors URI.getHost(): authority up to :port
    rest = url.split("://", 1)[1]
    authority = rest.split("/", 1)[0].split("?", 1)[0].split("#", 1)[0]
    if "@" in authority:
        authority = authority.rsplit("@", 1)[1]
    if authority.startswith("["):  # bracketed IPv6 literal
        host = authority[1:].split("]", 1)[0]
    else:
        host = authority.rsplit(":", 1)[0] if ":" in authority else authority
    if not host:
        return False, "no_host"
    for addr in resolver(host):
        if _address_blocked(addr):
            return False, "private_host"
    return True, ""


class FetchDocs:
    """Size-capped fetch over a url column (``HttpConnector.downloadFile``
    analog): validate → cache-lookup → transport → cap check.

    Emits ``(…, status, n_bytes, payload)`` where status is ``ok`` |
    ``blocked`` | ``too_large`` | ``error``; blocked/oversized rows
    carry a null payload (the reference moves such records to the
    error folder instead of crashing the indexer)."""

    def __init__(
        self,
        transport: Callable[[str], bytes],
        *,
        url_col: str = "url",
        allowed_prefixes: list[str] | None = None,
        max_bytes: int = 512 * 1024 * 1024,
        resolver: Callable[[str], list[str]] = host_addresses,
        cache_size: int = 1024,
        ttl_seconds: float = 24 * 3600,
        clock: Callable[[], float] | None = None,
    ):
        self.transport = transport
        self.url_col = url_col
        self.allowed_prefixes = allowed_prefixes
        self.max_bytes = max_bytes
        self.resolver = resolver
        kw = {"clock": clock} if clock is not None else {}
        self.cache = TTLCache(max_size=cache_size, ttl_seconds=ttl_seconds, **kw)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column(self.url_col).to_pylist()
        status, sizes, payloads = [], [], []
        for u in urls:  # inherent per-URL I/O loop (not a CPU kernel)
            ok, _reason = is_url_allowed(
                u, self.allowed_prefixes, resolver=self.resolver
            )
            if not ok:
                status.append("blocked")
                sizes.append(0)
                payloads.append(None)
                continue
            cached = self.cache.get(u)
            if cached is None:
                try:
                    cached = self.transport(u)
                except PayloadTooLarge:
                    # cap crossed mid-stream: abort is authoritative
                    status.append("too_large")
                    sizes.append(0)
                    payloads.append(None)
                    continue
                except Exception:
                    status.append("error")
                    sizes.append(0)
                    payloads.append(None)
                    continue
                if len(cached) <= self.max_bytes:  # never cache over-cap blobs
                    self.cache.put(u, cached)
            if len(cached) > self.max_bytes:
                status.append("too_large")
                sizes.append(0)
                payloads.append(None)
            else:
                status.append("ok")
                sizes.append(len(cached))
                payloads.append(cached)
        return batch.append_column(
            "status", pa.array(status, pa.string())
        ).append_column("n_bytes", pa.array(sizes, pa.int64())).append_column(
            "payload", pa.array(payloads, pa.binary())
        )


# --------------------------------------------------- frontier schedule

def crawl_schedule(ds, *, num_workers: int = 8,
                   host_col: str = "host", id_col: str = "doc_id",
                   priority_col: str = "priority",
                   delay_col: str = "delay_ms"):
    """Crawl-frontier politeness scheduling — the fetch *planning*
    half of the ingest path (:class:`FetchDocs` is the execution
    half; reference: ``Hotfolder.java``'s priority lane is the
    single-node analog of the priority key).

    Per host: urls rank by ``(priority asc, doc_id asc)`` into
    ``fetch_seq`` (0-based) and ``fetch_time_ms = fetch_seq ·
    delay_ms`` (the robots crawl-delay spacing); every host is pinned
    to ``worker = host % num_workers`` so the politeness invariant —
    one in-flight fetch per host, ``delay_ms`` apart — holds under
    distribution (urls of one host NEVER split across fetchers).

    Scale shape: ONE hash-partitioned ``groupby(host)`` with a fully
    vectorized per-group rank (lexsort + arange).  A hot host is
    inherently serial — that is the *semantics* of politeness, not a
    skew bug; the worker pinning is what makes the schedule valid at
    any cluster size.  Returns ``(doc_id, host, worker, fetch_seq,
    fetch_time_ms)``.
    """
    import numpy as np
    import pyarrow as pa

    def rank_host(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy()
        pri = g.column(priority_col).to_numpy()
        delay = g.column(delay_col).to_numpy()
        host = g.column(host_col).to_numpy()
        order = np.lexsort((ids, pri))
        seq = np.empty(ids.size, np.int64)
        seq[order] = np.arange(ids.size, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "host": pa.array(host, pa.int64()),
                "worker": pa.array(host % num_workers, pa.int64()),
                "fetch_seq": pa.array(seq, pa.int64()),
                "fetch_time_ms": pa.array(seq * delay, pa.int64()),
            }
        )

    return ds.groupby(host_col).map_groups(rank_host, batch_format="pyarrow")


def robots_match(ds, rules: list[tuple[int, str, int]], *,
                 host_col: str = "host", path_col: str = "path"):
    """robots.txt compliance filter for the crawl frontier — the
    missing PLANNING predicate between URL discovery and
    :func:`crawl_schedule` (Google REP semantics, RFC 9309: the
    MOST-SPECIFIC — longest-prefix — matching rule wins; on a length
    tie ``Allow`` wins; no matching rule ⇒ allowed).

    ``rules`` is the parsed per-host rule table ``(host, prefix,
    allow)`` — the small side, broadcast ONCE into the stage closure
    (`ray.put` under the hood via Ray's closure capture), never
    re-shipped per batch.  Matching is one vectorized
    ``pc.starts_with`` + host-equality pass PER RULE over each batch
    (linear in ``len(rules)`` — fine to ~10⁴ rules; beyond that the
    swap is a per-host sorted-prefix binary search, same output).

    Emits ``(doc_id, host, path, rule, allowed)`` — the winning rule
    string rides along so a frontier audit can explain every verdict.
    """
    rule_host = np.asarray([r[0] for r in rules], np.int64)
    rule_prefix = [r[1] for r in rules]
    rule_allow = np.asarray([r[2] for r in rules], np.int64)
    # specificity score: longest prefix wins, allow breaks ties
    rule_score = np.asarray(
        [2 * len(p) for p in rule_prefix], np.int64) + rule_allow

    def match(t: pa.Table) -> pa.Table:
        host = t.column(host_col).cast(pa.int64()).to_numpy()
        path = t.column(path_col)
        n = t.num_rows
        best = np.full(n, -1, np.int64)
        best_idx = np.zeros(n, np.int64)
        for ri in range(len(rule_prefix)):
            hit = (host == rule_host[ri]) & (
                pc.starts_with(path, pattern=rule_prefix[ri])
                .to_numpy(zero_copy_only=False)
            )
            upd = hit & (rule_score[ri] > best)
            best[upd] = rule_score[ri]
            best_idx[upd] = ri
        matched = best >= 0
        allowed = np.where(matched, rule_allow[best_idx], 1)
        rule_str = np.where(
            matched,
            np.asarray(rule_prefix, object)[best_idx],
            "",
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "host": pa.array(host, pa.int64()),
                "path": path,
                "rule": pa.array(rule_str, pa.string()),
                "allowed": pa.array(allowed.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(match, batch_format="pyarrow")
