"""M2 field-extraction DSL unit tests (per-field option semantics,
mirroring the reference's MetadataHelperTest / ValueNormalizerTest)."""

from goobi_viewer_indexer_ray.functions.fields import (
    DEFAULT_RULES,
    FieldRule,
    apply_rules,
    extract_landmarks,
)

HTML = """
<html lang="EN"><head>
  <title>&lt;&lt;The&gt;&gt; Great Title</title>
  <meta name="description" content="A &amp; B description">
  <meta property="og:title" content="OG title">
</head><body>
  <h1>Main Heading</h1>
  <h2>Section One</h2><h2>Section Two</h2><h2>Section One</h2>
  <p>Body text with <a href="x">a link</a>.</p>
  <script>var hidden = "nope";</script>
</body></html>
"""


def test_landmarks():
    lm = extract_landmarks(HTML)
    assert lm["title"] == ["<<The>> Great Title"]
    assert lm["meta.description"] == ["A & B description"]
    assert lm["h1"] == ["Main Heading"]
    assert lm["h2"] == ["Section One", "Section Two", "Section One"]
    assert lm["html.lang"] == ["EN"]
    assert "nope" not in str(lm)


def test_default_rules():
    out = apply_rules(HTML, DEFAULT_RULES)
    # non-sort bracket removal + sort field from first value
    assert out["MD_TITLE"] == ["Great Title"]
    assert out["SORT_MD_TITLE"] == ["Great Title"]
    # entity decoded exactly once
    assert out["MD_DESCRIPTION"] == ["A & B description"]
    # dedup keep-first on multivalued
    assert out["MD_HEADINGS"] == ["Section One", "Section Two"]
    assert out["MD_HEADINGS_UNTOKENIZED"] == ["Section One", "Section Two"]
    assert out["MD_LANGUAGE"] == ["en"]  # lowercase
    assert out["BOOL_MD_LANGUAGE"] == ["true"]
    assert out["MD_SOURCE"] == ["web"]  # constantValue
    # DEFAULT bag: space-joined, deduped, in rule order
    assert out["DEFAULT"] == ["Great Title A & B description Section One Section Two"]


def test_selector_first_nonempty_wins():
    out = apply_rules("<html><body><h1>only h1</h1></body></html>",
                      [FieldRule(name="T", selectors=["title", "h1"], multivalued=False)])
    assert out["T"] == ["only h1"]


def test_replace_rules_and_onetoken():
    rules = [FieldRule(name="X", selectors=["title"],
                       replace_rules=[("REGEX:[0-9]+", "9"), (",", "")],
                       one_token=True, lowercase=True)]
    out = apply_rules("<title>Ab, 123 Cd</title>", rules)
    assert out["X"] == ["ab9cd"]  # one_token strips remaining non-word chars


def test_value_normalizer_pad_truncate():
    # ValueNormalizer.java: pad front with filler / truncate
    r = FieldRule(name="N", selectors=["title"], normalize_length=6)
    assert apply_rules("<title>42</title>", [r])["N"] == ["000042"]
    r2 = FieldRule(name="N", selectors=["title"], normalize_length=2)
    assert apply_rules("<title>12345</title>", [r2])["N"] == ["45"]
    r3 = FieldRule(name="N", selectors=["title"], normalize_length=4,
                   normalize_position="rear", normalize_filler="x")
    assert apply_rules("<title>ab</title>", [r3])["N"] == ["abxx"]


def test_one_field_concat():
    r = FieldRule(name="J", selectors=["h2"], one_field=True)
    out = apply_rules("<h2>a</h2><h2>b</h2>", [r])
    assert out["J"] == ["a ; b"]


def test_existence_bool_false():
    r = FieldRule(name="Z", selectors=["title"], add_existence_bool=True)
    out = apply_rules("<p>no title</p>", [r])
    assert out["BOOL_Z"] == ["false"] and "Z" not in out


def test_ray_stage(ray_session, tiny_paths):
    import glob

    import ray.data as rd

    from goobi_viewer_indexer_ray.stages.fields import ExtractFields

    ds = rd.read_parquet(sorted(glob.glob(tiny_paths + "/*.parquet")))
    out = ds.map_batches(ExtractFields(), batch_format="pyarrow").to_pandas()
    assert {"url", "field", "pos", "value"} == set(out.columns)
    # every generated page has a title rule hit
    titles = out[out["field"] == "MD_TITLE"]
    assert titles["url"].nunique() > 150
    # DEFAULT bag present for pages with extracted metadata
    assert (out["field"] == "DEFAULT").any()


def test_split_separator():
    """The {SPLIT} option (MetadataHelper.java:745-753)."""
    from goobi_viewer_indexer_ray.functions.fields import FieldRule, apply_rules

    html = "<html><head><title>alpha; beta; alpha</title></head></html>"
    rules = [FieldRule(name="MD_A", selectors=["title"], split_separator=";")]
    out = apply_rules(html, rules)
    assert out["MD_A"] == ["alpha", "beta"]  # split + keep-first dedup


def test_interpolate_years():
    """Year-gap interpolation (MetadataHelper.java:429-435)."""
    from goobi_viewer_indexer_ray.functions.fields import (
        FieldRule, apply_rules, interpolate_years,
    )

    assert interpolate_years(["1990", "1993"]) == ["1990", "1991", "1992", "1993"]
    assert interpolate_years(["1990"]) == ["1990"]
    assert interpolate_years(["n/a", "2001", "1999"]) == ["1999", "2000", "2001", "n/a"]
    html = "<html><body><h2>1990</h2><h2>1992</h2></body></html>"
    rules = [FieldRule(name="MD_YEAR", selectors=["h2"], interpolate_years=True)]
    assert apply_rules(html, rules)["MD_YEAR"] == ["1990", "1991", "1992"]


def test_group_entity_records():
    """group_entity → child entity records linked to the owner field
    (GroupedMetadata.java:143-227; MetsIndexerTest METADATA-doc asserts)."""
    from goobi_viewer_indexer_ray.functions.fields import (
        EntitySpec, FieldRule, apply_rules_with_entities,
    )

    html = ("<html><body><p>by Ada Lovelace and Alan Turing</p>"
            "<p>with Grace Hopper</p></body></html>")
    rules = [
        FieldRule(
            name="MD_PERSON",
            selectors=["p"],
            group_entity=EntitySpec(
                pattern=r"(?P<first>[A-Z][a-z]+) (?P<last>[A-Z][a-z]+)",
                type_name="PERSON",
            ),
        )
    ]
    fields, ents = apply_rules_with_entities(html, rules)
    assert fields["MD_PERSON"] == ["Ada Lovelace", "Alan Turing", "Grace Hopper"]
    assert [e["LAST"] for e in ents] == ["Lovelace", "Turing", "Hopper"]
    assert all(e["ENTITY_TYPE"] == "PERSON" for e in ents)
    assert all(e["OWNER_FIELD"] == "MD_PERSON" for e in ents)
    assert [e["POS"] for e in ents] == ["0", "1", "2"]


def test_lang_analyzers():
    """Per-language analyzer registry (*_LANG_XX / LanguageHelper analog)."""
    from goobi_viewer_indexer_ray.functions.tokenize import (
        analyzer_for, register_analyzer, tokenize, tokenize_lang,
    )

    assert tokenize_lang("the quick fox", "en") == ["quick", "fox"]
    assert tokenize_lang("der schnelle Fuchs", "de") == ["schnelle", "fuchs"]
    assert tokenize_lang("the quick fox", "xx") == ["the", "quick", "fox"]
    assert analyzer_for(None) is tokenize
    register_analyzer("xx", lambda t: ["custom"])
    try:
        assert tokenize_lang("whatever", "xx") == ["custom"]
    finally:
        from goobi_viewer_indexer_ray.functions import tokenize as _m

        _m._ANALYZERS.pop("xx", None)


def test_roman_numeral_roundtrip():
    """RomanNumeral.java parity: canonical generation 1..3999 and the
    independent subtractive-rule parser agree; non-roman → None."""
    from goobi_viewer_indexer_ray.functions.fields import (
        int_to_roman,
        roman_to_int,
    )

    for n in (1, 4, 9, 14, 40, 90, 400, 900, 1994, 3888, 3999):
        assert roman_to_int(int_to_roman(n)) == n
    assert int_to_roman(1994) == "mcmxciv"
    assert roman_to_int("XII") == 12          # case-insensitive
    assert roman_to_int("abc") is None
    assert roman_to_int("") is None
    import pytest

    with pytest.raises(ValueError):
        int_to_roman(0)
    with pytest.raises(ValueError):
        int_to_roman(4000)


# ------------------------------------- DateTools.normalizeDate parity

def test_normalize_date_format_chain():
    from goobi_viewer_indexer_ray.functions.dates import normalize_date

    assert normalize_date("2020-05-03T10:11:12") == [(2020, 5, 3)]
    assert normalize_date("2020-05-03T10:11:12Z") == [(2020, 5, 3)]
    assert normalize_date("13.05.2020") == [(2020, 5, 13)]
    assert normalize_date("2020-05-03") == [(2020, 5, 3)]
    assert normalize_date("2020-05") == [(2020, 5, 1)]  # day defaults 1
    assert normalize_date("05/13/2020") == [(2020, 5, 13)]  # US month first
    assert normalize_date("2020.05.13") == [(2020, 5, 13)]
    assert normalize_date("2020/05/13") == [(2020, 5, 13)]


def test_normalize_date_range_and_fallback_branches():
    import pytest

    from goobi_viewer_indexer_ray.functions.dates import normalize_date

    # range branch: '-' present, not leading
    assert normalize_date("1870-1880") == [(1870, None, None),
                                           (1880, None, None)]
    # the faithful [\d+]\d+ quirk: a negative year inside a range
    # string loses its sign
    assert normalize_date("vor -1234 oder 99") == [(1234, None, None)]
    # leading '-' -> NUMBER branch, sign kept
    assert normalize_date("-1234") == [(-1234, None, None)]
    # loose numbers, min-digit and max-digit bounds (5 max)
    assert normalize_date("ca. 1870 bis 999 und 123456") == \
        [(1870, None, None)]
    # invalid calendar date falls through the chain into the range
    # branch (Java's SMART resolver rejects month 13 the same way)
    assert normalize_date("2020-13-01") == [(2020, None, None)]
    with pytest.raises(ValueError):
        normalize_date("1870", 0)
