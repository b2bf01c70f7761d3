"""URL canonicalization — the web-corpus analog of the reference's
identifier normalization (PI extraction/validation and
``MetadataHelper.applyIdentifierModifications``; SURVEY.md M1): one
canonical key per record so dedup/update joins hit.

Rules (each a standard web-canonicalization step):

- scheme and host lowercase; path/query case preserved;
- leading ``www.`` stripped from the host;
- default ports ``:80`` / ``:443`` stripped;
- the fragment dropped (never reaches the server);
- ``utm_*`` tracking parameters dropped (with their separator, fixing
  up a now-leading ``&``).

Everything is vectorized pandas ``.str`` kernels (C regex over the
whole column) — no per-row Python — so the function drops straight
into a ``map_batches(batch_format="pandas")`` stage.
"""

from __future__ import annotations

import pandas as pd

__all__ = ["canonical_url", "normalize_urls"]

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_SCHEME_NC = r"^[A-Za-z][A-Za-z0-9+.\-]*://"  # non-capturing variant


def normalize_urls(urls: pd.Series) -> pd.DataFrame:
    """Messy absolute URLs → ``(scheme, host, url_canon)``.

    Unparseable rows (no ``scheme://host``) get nulls.
    """
    s = urls.astype("string")
    scheme = s.str.extract(_SCHEME, expand=False).str.lower()
    hostport = s.str.extract(_SCHEME_NC + r"([^/?#]+)", expand=False).str.lower()
    # default-port stripping is SCHEME-AWARE: https://h:80 is a real
    # non-default origin and must keep its port (and vice versa);
    # schemes other than http/https keep ANY port — :443 is not a
    # default for ftp/ws/..., so stripping it would collapse two
    # distinct origins onto one dedup/update key
    host = hostport.str.replace(r"^www\.", "", regex=True)
    host = (
        host.str.replace(r":80$", "", regex=True)
        .where(scheme == "http", host.str.replace(r":443$", "", regex=True))
        .where(scheme.isin(["http", "https"]), host)
    )
    rest = s.str.extract(_SCHEME_NC + r"[^/?#]+([/?#].*)?$", expand=False).fillna("")
    rest = rest.str.replace(r"#.*$", "", regex=True)
    # tracking params: each utm_* param collapses to its own separator
    # (ANCHORED on [?&] — `q=my_utm_tag` must not match), then
    # separator runs left by adjacent removals collapse, then a
    # trailing lone ?/& drops
    rest = rest.str.replace(r"([?&])utm_[^&#]*", r"\1", regex=True)
    rest = rest.str.replace(r"([?&])[?&]+", r"\1", regex=True)
    rest = rest.str.replace(r"[?&]+$", "", regex=True)
    canon = scheme + "://" + host + rest
    return pd.DataFrame({"scheme": scheme, "host": host, "url_canon": canon})


class _HeadMetaParser:
    """Minimal HTML-head scanner for the canonical/robots signals —
    real parsing (stdlib HTMLParser: any attribute order, quoting,
    case), not regex."""

    def __init__(self):
        from html.parser import HTMLParser

        outer = self

        class P(HTMLParser):
            def handle_starttag(self, tag, attrs):
                a = {k.lower(): (v or "") for k, v in attrs}
                if tag == "link" and a.get("rel", "").lower() == "canonical":
                    if outer.canonical is None and a.get("href"):
                        outer.canonical = a["href"]
                elif tag == "meta":
                    prop = (a.get("property") or a.get("name") or "").lower()
                    if prop == "og:url" and a.get("content"):
                        if outer.og_url is None:
                            outer.og_url = a["content"]
                    elif prop == "robots":
                        outer.robots = a.get("content", "").lower()

        self.canonical: str | None = None
        self.og_url: str | None = None
        self.robots: str = ""
        self._p = P()

    def feed(self, html: str):
        self._p.feed(html)
        return self


def canonical_url(html: str, base_url: str) -> tuple[str, int, int]:
    """Per-page canonicalization decision (the dedup-by-canonical
    half of a crawler's URL pipeline; precedence per Google's
    published canonicalization guidance):

    1. first ``<link rel="canonical" href=...>`` wins (resolved
       against ``base_url`` — relative canonicals are common);
    2. else ``og:url``;
    3. else the page's own URL.

    Returns ``(canonical, rule, noindex)`` with ``rule`` 1/2/3 per
    the branch taken and ``noindex`` from ``<meta name=robots>``
    containing the ``noindex`` token.
    """
    from urllib.parse import urljoin

    m = _HeadMetaParser().feed(html)
    noindex = int("noindex" in {t.strip() for t in m.robots.split(",")})
    if m.canonical:
        return urljoin(base_url, m.canonical), 1, noindex
    if m.og_url:
        return urljoin(base_url, m.og_url), 2, noindex
    return base_url, 3, noindex
