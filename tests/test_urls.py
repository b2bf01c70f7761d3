"""URL canonicalization kernel (functions/urls.py) — pure pandas, no Ray."""

import pandas as pd

from goobi_viewer_indexer_ray.functions.urls import normalize_urls


def _one(u: str) -> dict:
    df = normalize_urls(pd.Series([u]))
    return {c: df[c][0] for c in df.columns}


def test_case_port_www():
    r = _one("HTTP://WWW.Example.COM:80/Path/File?id=3")
    assert r["scheme"] == "http"
    assert r["host"] == "example.com"
    assert r["url_canon"] == "http://example.com/Path/File?id=3"


def test_https_default_port():
    assert _one("https://a.b:443/x")["url_canon"] == "https://a.b/x"


def test_non_default_port_kept():
    assert _one("https://a.b:8443/x")["host"] == "a.b:8443"


def test_default_port_is_scheme_aware():
    # :80 is only default for http; :443 only for https
    assert _one("https://a.b:80/x")["host"] == "a.b:80"
    assert _one("http://a.b:443/x")["host"] == "a.b:443"


def test_non_http_schemes_keep_any_port():
    # ftp/ws have no http(s) default ports — :443/:80 are real origins
    # there and must survive (they're the dedup/update join key)
    assert _one("ftp://a.b:443/x")["host"] == "a.b:443"
    assert _one("ftp://a.b:80/x")["host"] == "a.b:80"
    assert _one("ws://a.b:443/x")["url_canon"] == "ws://a.b:443/x"


def test_multiple_utm_params():
    assert _one("https://a.b/x?utm_a=1&utm_b=2&id=3")["url_canon"] == "https://a.b/x?id=3"
    assert _one("https://a.b/x?utm_a=1&utm_b=2")["url_canon"] == "https://a.b/x"


def test_utm_substring_in_other_param_untouched():
    # 'utm_' inside a value or a non-utm param name must NOT match
    assert _one("http://a.com/?q=my_utm_tag&b=2")["url_canon"] == "http://a.com/?q=my_utm_tag&b=2"
    assert _one("http://a.com/p?a=1&xutm_b=2&c=3")["url_canon"] == "http://a.com/p?a=1&xutm_b=2&c=3"


def test_fragment_dropped():
    assert _one("https://a.b/x#frag?not=query")["url_canon"] == "https://a.b/x"


def test_utm_leading_param():
    assert _one("https://a.b/x?utm_s=1&id=2")["url_canon"] == "https://a.b/x?id=2"


def test_utm_trailing_param():
    assert _one("https://a.b/x?id=2&utm_s=1")["url_canon"] == "https://a.b/x?id=2"


def test_utm_only_param():
    assert _one("https://a.b/x?utm_s=1")["url_canon"] == "https://a.b/x"


def test_path_case_preserved():
    assert _one("https://A.B/CaSe")["url_canon"] == "https://a.b/CaSe"


def test_unparseable_is_null():
    r = _one("not a url")
    assert pd.isna(r["scheme"]) and pd.isna(r["url_canon"])


def test_www_only_stripped_at_start():
    assert _one("https://cdn.www.example.com/")["host"] == "cdn.www.example.com"


def test_canonical_url_precedence_and_resolution():
    from goobi_viewer_indexer_ray.functions.urls import canonical_url

    base = "https://a.example.com/dir/page.html"
    # link beats og:url; relative href resolves against the base
    html = ('<head><meta property="og:url" content="https://og/x">'
            '<link rel="canonical" href="../c/1"></head>')
    assert canonical_url(html, base) == ("https://a.example.com/c/1", 1, 0)
    # og:url fallback
    assert canonical_url(
        '<meta property="og:url" content="https://og/x">', base
    ) == ("https://og/x", 2, 0)
    # self fallback + noindex token parsing (case, spacing, list)
    assert canonical_url(
        '<META NAME="ROBOTS" CONTENT=" NOINDEX , nofollow ">', base
    ) == (base, 3, 1)
    # 'noindexx' is NOT the noindex token
    assert canonical_url(
        '<meta name="robots" content="noindexx">', base
    )[2] == 0
    # first canonical wins over later ones
    html2 = ('<link rel="canonical" href="https://c1/">'
             '<link rel="canonical" href="https://c2/">')
    assert canonical_url(html2, base)[0] == "https://c1/"
