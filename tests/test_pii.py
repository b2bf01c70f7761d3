"""functions/pii.py — redaction kernels and the engine↔SQL rule sharing."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from goobi_viewer_indexer_ray.functions.pii import (
    RULES, scrub_pii, sql_count_expr, sql_scrub_expr,
)

CASES = [
    "contact me at john.doe+x@sub.example.com or call +1 555 0123 456",
    "server 192.168.0.1 and 10.0.0.255, fallback 999.999.999.999",
    "phone: 555-0123-456, other 12345678, short 123456",
    "a@b.co x@y.museum no-pii here 1.2.3.4.5",
    "",
    "mixed a@b.com 1.2.3.4 +49 30 123456",
    "dots 1.2.3.4text and email@domain.comX trail",
    None,
]


def test_scrub_matches_duckdb_on_edge_cases():
    got = scrub_pii(pd.Series(CASES, dtype=object))
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"text": CASES}))
    col = "coalesce(text, '')"
    q = (f"SELECT {sql_scrub_expr(col)} AS scrubbed,"
         f" {sql_count_expr(col, 0)} AS n_emails,"
         f" {sql_count_expr(col, 1)} AS n_ips,"
         f" {sql_count_expr(col, 2)} AS n_phones FROM t")
    want = con.execute(q).fetch_df()
    for c in ("scrubbed", "n_emails", "n_ips", "n_phones"):
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c


def test_scrub_is_idempotent():
    once = scrub_pii(pd.Series(CASES, dtype=object))
    twice = scrub_pii(once["scrubbed"])
    assert twice["scrubbed"].tolist() == once["scrubbed"].tolist()
    assert (twice[["n_emails", "n_ips", "n_phones"]].sum().sum()) == 0


def test_email_rule_wins_over_phone_digits():
    # digits inside an email local part must not leak into a phone match
    out = scrub_pii(pd.Series(["write 12345678@example.com now"]))
    assert out["scrubbed"][0] == "write <EMAIL> now"
    assert out["n_emails"][0] == 1 and out["n_phones"][0] == 0


def test_ip_rule_wins_over_phone_digits():
    out = scrub_pii(pd.Series(["ping 10.20.30.40 then dial 555 123 4567"]))
    assert out["scrubbed"][0] == "ping <IP> then dial <PHONE>"
    assert out["n_ips"][0] == 1 and out["n_phones"][0] == 1


def test_unicode_digits_stay_ascii_parity():
    """RE2's \\d/\\b are ASCII-only; the engine must match (re.ASCII),
    so Arabic-Indic digits are NOT phone/IP matches on either side."""
    cases = ["call ٣٣٣٣٣٣٣٣ now", "ip ٣1.2.3.4 x"]
    got = scrub_pii(pd.Series(cases))
    assert got["scrubbed"][0] == cases[0]  # untouched
    assert got["n_phones"].tolist() == [0, 0]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"text": cases}))
    want = con.execute(
        f"SELECT {sql_scrub_expr('text')} AS s FROM t").fetch_df()
    assert got["scrubbed"].tolist() == want["s"].tolist()


def test_rule_order_is_fixed():
    # the SQL builders iterate RULES in order — a reorder would silently
    # change semantics on both sides, so pin it
    assert [r for _, r in RULES] == ["<EMAIL>", "<IP>", "<PHONE>"]
