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

__all__ = ["normalize_urls"]

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
