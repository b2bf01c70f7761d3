"""Golden tests pinning the extractor spec (byte-identical invariant).

Transposes the reference's ALTO/charset extraction tests
(``TextHelperTest.java``) to HTML: every edge-case fixture row of the
synthetic corpus has its exact expected output pinned here.  If any of
these change, ENGINE_SPEC_VERSION must be bumped and all goldens
regenerated knowingly.
"""

from goobi_viewer_indexer_ray.functions.extract import decode_html, detect_charset, extract_text
from goobi_viewer_indexer_ray.sources.corpus import EDGE_CASES

GOLDEN = {
    0: "Café München\nÜbermäßig café naïve straße",
    1: "Fish & Chips &amp; more <tags> éclair",
    2: "price < 100 and x",
    3: "This document is hyphenated badly",
    4: "outer\none\ntwo\ndeep\ntail",
    5: "café résumé",
    6: "visible only",
    7: "",
    8: "",
    10: "utf sixteen bytes wide",
    11: "trunca",
}


def test_edge_case_goldens():
    for i, want in GOLDEN.items():
        assert extract_text(EDGE_CASES[i]) == want, f"edge case {i}"


def test_charset_detection():
    assert detect_charset("<meta charset='iso-8859-1'>".encode()) == "iso8859-1"
    assert detect_charset(b"\xef\xbb\xbfplain utf8 bom") == "utf-8"
    assert detect_charset("plain ascii".encode()) == "utf-8"
    assert detect_charset("ünïcode utf8 body".encode()) == "utf-8"
    # invalid utf-8, no declaration → cp1252 fallback
    assert detect_charset(b"caf\xe9 latin") == "cp1252"
    assert decode_html(b"caf\xe9 latin") == "café latin"
    # bogus charset label falls through to utf-8
    assert detect_charset(b"<meta charset='no-such-charset'>x") == "utf-8"


def test_nfc_normalization():
    # decomposed e + combining acute must come out composed
    html = "<p>café</p>".encode()
    assert extract_text(html) == "café"
    assert "́" not in extract_text(html)


def test_soft_hyphen_removed():
    assert extract_text(b"<p>hy\xc2\xadphen</p>") == "hyphen"


def test_extraction_total_on_garbage():
    # must never raise, whatever the bytes
    for raw in [b"", b"\x00\xff\xfe", b"<", b"<<<>>>", b"<html", bytes(range(256))]:
        assert isinstance(extract_text(raw), str)


def test_block_vs_inline():
    assert extract_text(b"<p>a<b>b</b>c</p><p>d</p>") == "abc\nd"
    assert extract_text(b"x<br>y") == "x\ny"
    assert extract_text(b"<span>a</span> <span>b</span>") == "a b"
