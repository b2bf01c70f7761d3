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
