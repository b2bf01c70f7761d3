"""SSRF policy + fetch stage (stages/fetch.py) — mirrors the reference's
``SsrfProtection`` ``@should`` contract list plus the fetch control flow.
Pure logic; no Ray needed."""

import pyarrow as pa

from goobi_viewer_indexer_ray.stages.fetch import FetchDocs, is_url_allowed


def fake_resolver(mapping):
    return lambda host: mapping.get(host, [])


# --- the reference's @should list, case by case ---


def test_reject_null_and_blank():
    assert is_url_allowed(None)[1] == "blank"
    assert is_url_allowed("   ")[1] == "blank"


def test_reject_non_http_scheme():
    assert is_url_allowed("ftp://example.com/x")[1] == "scheme"
    assert is_url_allowed("file:///etc/passwd")[1] == "scheme"


def test_reject_localhost():
    assert is_url_allowed("http://127.0.0.1/x")[1] == "private_host"
    r = fake_resolver({"localhost": ["127.0.0.1"]})
    assert is_url_allowed("http://localhost/x", resolver=r)[1] == "private_host"


def test_reject_private_ip_ranges():
    for ip in ("10.0.0.1", "172.16.5.5", "192.168.1.1"):
        assert is_url_allowed(f"http://{ip}/x")[1] == "private_host"


def test_reject_aws_metadata_endpoint():
    assert is_url_allowed("http://169.254.169.254/latest/meta-data")[1] == "private_host"


def test_allow_public_url_with_empty_or_null_allowlist():
    assert is_url_allowed("https://example.org/x", [])[0] is True
    assert is_url_allowed("https://example.org/x", None)[0] is True
    assert is_url_allowed("http://93.184.216.34/x")[0] is True


def test_reject_url_not_in_allowlist():
    ok, reason = is_url_allowed("https://evil.org/x", ["https://good.org/"])
    assert not ok and reason == "not_in_allowlist"


def test_allow_url_matching_allowlist():
    assert is_url_allowed("https://good.org/a/b", ["https://good.org/"])[0]


def test_reject_private_ip_even_if_in_allowlist():
    ok, reason = is_url_allowed("http://10.0.0.1/x", ["http://10.0.0.1/"])
    assert not ok and reason == "private_host"


def test_reject_loopback_and_link_local_resolved_hosts():
    r = fake_resolver({"h.example": ["169.254.3.4"]})
    assert is_url_allowed("http://h.example/x", resolver=r)[1] == "private_host"
    r = fake_resolver({"h.example": ["::1"]})
    assert is_url_allowed("http://h.example/x", resolver=r)[1] == "private_host"


def test_one_private_address_taints_host():
    # DNS-rebinding shape: one public + one private A record → reject
    r = fake_resolver({"h.example": ["93.184.216.34", "10.0.0.1"]})
    assert not is_url_allowed("http://h.example/x", resolver=r)[0]


def test_reject_legacy_numeric_ip_forms():
    # inet_aton parses these to loopback WITHOUT DNS — must be blocked
    assert is_url_allowed("http://2130706433/x")[1] == "private_host"  # decimal
    assert is_url_allowed("http://127.1/x")[1] == "private_host"  # short form
    assert is_url_allowed("http://0x7f000001/x")[1] == "private_host"  # hex
    assert is_url_allowed("http://0177.0.0.1/x")[1] == "private_host"  # octal


def test_ipv6_literal_and_port_parsing():
    assert is_url_allowed("http://[::1]:8080/x")[1] == "private_host"
    assert is_url_allowed("http://93.184.216.34:8080/x")[0]
    assert is_url_allowed("http://user:pw@127.0.0.1/x")[1] == "private_host"


# --- FetchDocs control flow (fake transport, no network) ---


def _batch(urls):
    return pa.table({"url": pa.array(urls, pa.string())})


def test_fetch_validates_caps_and_caches():
    calls = []

    def transport(u):
        calls.append(u)
        return b"x" * (10_000 if "big" in u else 8)

    f = FetchDocs(transport, max_bytes=4096)
    out = f(_batch([
        "https://a.org/doc", "http://10.0.0.1/secret",
        "https://a.org/big", "https://a.org/doc",  # repeat → cache hit
    ]))
    assert out.column("status").to_pylist() == ["ok", "blocked", "too_large", "ok"]
    assert out.column("n_bytes").to_pylist() == [8, 0, 0, 8]
    assert out.column("payload").to_pylist()[1] is None
    assert calls == ["https://a.org/doc", "https://a.org/big"]  # blocked never fetched
    assert f.cache.hits == 1


def test_fetch_transport_error_is_row_status():
    def transport(u):
        raise IOError("boom")

    out = FetchDocs(transport)(_batch(["https://a.org/x"]))
    assert out.column("status").to_pylist() == ["error"]


# --- recorded-fixture transport (HttpConnector behaviors, no network) ---


def _rt(tmp_path, **kw):
    from goobi_viewer_indexer_ray.stages.fetch import RecordedTransport

    return RecordedTransport(str(tmp_path / "tapes"), **kw)


def test_recorded_retry_then_success(tmp_path):
    naps = []
    t = _rt(tmp_path, max_retries=3, backoff_s=0.1, sleep=naps.append)
    t.record("https://pub.example/a", [b"hello ", b"world"], fail_times=2)
    assert t("https://pub.example/a") == b"hello world"
    assert t.calls == 3  # 2 scripted failures + 1 success
    assert naps == [0.1, 0.2]  # exponential backoff between tries


def test_recorded_retries_exhausted(tmp_path):
    from goobi_viewer_indexer_ray.stages.fetch import TransportError

    t = _rt(tmp_path, max_retries=2, backoff_s=0, sleep=lambda s: None)
    t.record("https://pub.example/b", [b"x"], fail_times=5)
    import pytest

    with pytest.raises(TransportError):
        t("https://pub.example/b")
    assert t.calls == 3  # 1 + 2 retries, then permanent


def test_recorded_unrecorded_url(tmp_path):
    from goobi_viewer_indexer_ray.stages.fetch import TransportError

    t = _rt(tmp_path)
    import pytest

    with pytest.raises(TransportError):
        t("https://never.recorded/x")


def test_size_cap_aborts_mid_stream(tmp_path):
    from goobi_viewer_indexer_ray.stages.fetch import PayloadTooLarge

    t = _rt(tmp_path, max_bytes=250, sleep=lambda s: None)
    t.record("https://pub.example/big", [b"x" * 100] * 10)
    import pytest

    with pytest.raises(PayloadTooLarge) as ei:
        t("https://pub.example/big")
    # aborted after the 3rd chunk (300 bytes > 250) — 7 chunks unread
    assert t.chunks_read == 3
    assert ei.value.bytes_read == 300
    assert t.calls == 1  # permanent: the abort is NOT retried


def test_fetch_docs_end_to_end_with_recorded_transport(tmp_path):
    """retry + mid-stream cap + TTL cache through the REAL stage."""
    from goobi_viewer_indexer_ray.stages.fetch import FetchDocs

    t = _rt(tmp_path, max_retries=3, backoff_s=0, max_bytes=250,
            sleep=lambda s: None)
    t.record("https://pub.example/ok", [b"fine"], fail_times=1)  # retried
    t.record("https://pub.example/big", [b"x" * 100] * 10)       # cap abort
    t.record("https://pub.example/dead", [b"y"], fail_times=9)   # exhausted

    now = [0.0]
    f = FetchDocs(t, ttl_seconds=60, clock=lambda: now[0])
    batch = pa.table({"url": pa.array([
        "https://pub.example/ok",
        "https://pub.example/big",
        "https://pub.example/dead",
        "http://127.0.0.1/x",
    ])})
    out = f(batch)
    assert out.column("status").to_pylist() == [
        "ok", "too_large", "error", "blocked"]
    assert out.column("payload").to_pylist()[0] == b"fine"

    # cache absorbs the repeat (no new transport request)...
    calls_before = t.calls
    f(pa.table({"url": pa.array(["https://pub.example/ok"])}))
    assert t.calls == calls_before
    # ...until the TTL expires — then it re-fetches
    now[0] = 61.0
    f(pa.table({"url": pa.array(["https://pub.example/ok"])}))
    assert t.calls == calls_before + 1


def test_robots_match_rfc9309_semantics(ray_session):
    """Longest-prefix wins; Allow beats Disallow on a length tie;
    unmatched paths are allowed (RFC 9309 / Google REP)."""
    import ray.data

    from goobi_viewer_indexer_ray.stages.fetch import robots_match

    rules = [
        (0, "/a", 0),
        (0, "/a/pub", 1),       # longer → overrides the Disallow
        (0, "/tie", 0),
        (0, "/tie", 1),         # same length → Allow wins
        (1, "/a", 0),           # other host: rules don't leak
    ]
    rows = [
        {"doc_id": 0, "host": 0, "path": "/a/secret"},
        {"doc_id": 1, "host": 0, "path": "/a/pub/x"},
        {"doc_id": 2, "host": 0, "path": "/tie/x"},
        {"doc_id": 3, "host": 0, "path": "/elsewhere"},
        {"doc_id": 4, "host": 2, "path": "/a/secret"},
    ]
    out = {r["doc_id"]: r for r in
           robots_match(ray.data.from_items(rows), rules).take_all()}
    assert out[0]["allowed"] == 0 and out[0]["rule"] == "/a"
    assert out[1]["allowed"] == 1 and out[1]["rule"] == "/a/pub"
    assert out[2]["allowed"] == 1
    assert out[3]["allowed"] == 1 and out[3]["rule"] == ""
    assert out[4]["allowed"] == 1   # host 2 has no rules at all
