"""Authority normalization (functions/authority.py — the
MetadataHelper.parseAuthorityMetadata transposition) plus the
NormalizeAuthority actor stage.  The catalog entry authority_norm is
hash-checked against the SQL oracle in test_catalog.py; these pin the
branches the synthesis there doesn't reach (language override,
sanitize edge cases, record-level failures)."""

import json

import pyarrow as pa
import pytest

from goobi_viewer_indexer_ray.functions.authority import (
    extract_language_code,
    parse_authority_fields,
    sanitize_authority_url,
)


def test_sanitize_url():
    # bare identifier → GND promotion (MetadataHelper.java:484-487)
    assert sanitize_authority_url("118540238") == "https://d-nb.info/gnd/118540238"
    assert sanitize_authority_url(" https://viaf.org/viaf/1 ") == "https://viaf.org/viaf/1"
    # newline: first line only (sanitizeAuthorityUrl, :1195-1208)
    assert sanitize_authority_url("https://a/x\nhttps://b/y") == "https://a/x"
    assert sanitize_authority_url("https://a/x\r\nattack") == "https://a/x"
    assert sanitize_authority_url(None) == ""
    assert sanitize_authority_url("   ") == ""


def test_extract_language_code():
    assert extract_language_code("NORM_NAME_LANG_DE") == "de"
    assert extract_language_code("MD_AUTHOR_LANG_EN") == "en"
    # exactly two trailing chars required (MetadataHelper.java:1523)
    assert extract_language_code("NORM_NAME_LANG_DEU") is None
    assert extract_language_code("NORM_NAME") is None
    assert extract_language_code(None) is None


def test_basic_routing_and_twins():
    rows, default, terms = parse_authority_fields(
        [
            ("NORM_NAME", "Goethe"),
            ("NORM_URI", "https://d-nb.info/gnd/1"),
            ("NORM_STATICPAGE", "skip"),
            ("OTHER", "skip"),
            ("NORM_ALTNAME", "Goethe"),  # dup value → no NAME_SEARCH
        ],
        label_field="MD_AUTHOR",
        add_to_default=("NORM_NAME",),
    )
    assert ("NORM_NAME", "Goethe") in rows
    assert ("NORM_NAME_UNTOKENIZED", "Goethe") in rows
    assert ("MD_AUTHOR_NAME_SEARCH", "Goethe") in rows
    # the dup ALTNAME emits the field + twin but no second NAME_SEARCH
    assert rows.count(("MD_AUTHOR_NAME_SEARCH", "Goethe")) == 1
    assert ("NORM_ALTNAME", "Goethe") in rows
    # URI excluded from NORMDATATERMS, skips never appear
    assert "gnd/1" not in terms
    assert "skip" not in terms
    assert default == "Goethe"
    assert rows[-1] == ("BOOL_WKT_COORDS", "false")


def test_language_override():
    """NORM_FOO values replaced by NORM_FOO_LANG_XX when the label
    field carries that language (MetadataHelper.java:676-698)."""
    rows, _, _ = parse_authority_fields(
        [
            ("NORM_NAME", "plain"),
            ("NORM_NAME_LANG_DE", "deutsch"),
            ("NORM_NAME_LANG_FR", "français"),  # other lang → dropped
        ],
        label_field="MD_AUTHOR_LANG_DE",
    )
    fields = [r for r in rows if r[0] == "NORM_NAME"]
    assert fields == [("NORM_NAME", "deutsch")]
    assert ("NORM_NAME_UNTOKENIZED", "deutsch") in rows
    assert all("français" != v for _, v in rows)
    # the language variant field itself also survives (with its twin)
    assert ("NORM_NAME_LANG_DE", "deutsch") in rows
    assert ("NORM_NAME_LANG_DE_UNTOKENIZED", "deutsch") in rows


def test_no_language_label_drops_suffixed_fields():
    rows, _, terms = parse_authority_fields(
        [("NORM_NAME", "x"), ("NORM_NAME_LANG_DE", "y")],
        label_field="MD_AUTHOR",
    )
    assert all(r[0].startswith(("NORM_NAME", "MD_AUTHOR", "BOOL")) for r in rows)
    assert not any(v == "y" for _, v in rows)
    # ...but the bag accumulation happens BEFORE language routing
    assert "y" in terms


def test_lifeperiod_and_coords():
    rows, _, _ = parse_authority_fields(
        [
            ("NORM_LIFEPERIOD", "1749 - 1832"),
            ("NORM_COORDS", "10 51"),
        ],
        label_field="MD_AUTHOR",
    )
    assert ("MD_AUTHOR_DATE_SEARCH", "1749") in rows
    assert ("MD_AUTHOR_DATE_SEARCH", "1832") in rows
    assert ("NORM_DATE_UNTOKENIZED", "1749") in rows
    assert ("WKT_COORDS", "POINT (10 51)") in rows
    assert rows[-1] == ("BOOL_WKT_COORDS", "true")


def test_bag_containment_dedup_java_spacing():
    """The bag is a ' v '-appended string: ' x y ' is NOT contained in
    ' a x  y b ' (double space) — the corner the reference's
    StringBuilder spacing creates."""
    rows, _, terms = parse_authority_fields(
        [("NORM_A", "a x"), ("NORM_B", "y b"), ("NORM_C", "x y")],
        label_field="",
    )
    assert terms == "a x  y b  x y"


def test_replace_rules():
    rows, _, _ = parse_authority_fields(
        [("NORM_NAME", "fo<o>")],
        label_field="",
        replace_rules=[("<", "("), (">", ")")],
    )
    assert ("NORM_NAME", "fo(o)") in rows


def test_stage_cache_and_failures(ray_session, tmp_path):
    import ray.data

    from goobi_viewer_indexer_ray.stages.authority import NormalizeAuthority

    # the transport runs inside Ray workers — log calls via the fs
    log_dir = str(tmp_path / "calls")
    import os as _os

    _os.makedirs(log_dir, exist_ok=True)

    def transport(url, _log=log_dir):
        import os as _o
        import uuid as _u

        rid = url.rsplit("/", 1)[1]
        open(_o.path.join(_log, f"{rid}_{_u.uuid4().hex}"), "w").close()
        if url.endswith("/13"):
            raise OSError("boom")
        if url.endswith("/7"):
            return b"[]"  # empty record: "No authority data fields found."
        return json.dumps([["NORM_NAME", "N" + rid]]).encode()

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "authority_url": pa.array(["5", "5", "13", "7", None], pa.string()),
            }
        )
    )
    out = (
        ds.map_batches(
            NormalizeAuthority,
            fn_constructor_kwargs={"transport": transport, "label_field": ""},
            batch_format="pyarrow",
            concurrency=1,
            batch_size=64,
        )
        .to_pandas()
        .sort_values(["id", "pos"])
    )
    # doc 1 and 2 share the record; the TTL cache absorbs the repeat
    import glob as _glob

    assert len(_glob.glob(f"{log_dir}/5_*")) == 1
    got = set(zip(out["id"], out["field"], out["value"]))
    assert (1, "NORM_NAME", "N5") in got and (2, "NORM_NAME", "N5") in got
    # failed fetch / empty record / null url → no rows (ref: warn+skip)
    assert not set(out["id"]) & {3, 4, 5}
