"""HTML → canonical text extraction (the engine's critical per-row map).

This is the web-page transposition of the reference's full-text
extraction & canonicalization chain
(``helper/FulltextAugmentor.java:78-238`` →
``helper/TextHelper.java:139-327``): the reference walks ALTO
block/line/word structure emitting ``' '`` between words, ``'\n'`` per
line and per block, merges hyphenated words via ``SUBS_CONTENT``
(``TextHelper.java:312-319``), strips HTML with Jsoup
(``TextHelper.java:486-494``), detects charsets with ICU4j
(``helper/FileTools.java:114-157``) and NFC-normalizes
(``TextHelper.java:94-100``).  Entities are unescaped exactly once
(``helper/MetadataHelper.java:864-872``).

Transposed spec (self-contained — stdlib only — and pinned by golden
fixtures in ``tests/test_extract.py``; bump
``goobi_viewer_indexer_ray.ENGINE_SPEC_VERSION`` on any change):

1. **Charset**: UTF-8/UTF-16 BOM wins; else the first
   ``charset=``/``encoding=`` declaration in the first 4096 bytes
   (``<meta charset>``, ``http-equiv`` or XML prolog); else strict
   UTF-8; else windows-1252.  Decoding always uses
   ``errors="replace"`` so extraction is total.
2. **Structure**: contents of ``script/style/template/noscript``,
   comments, CDATA and processing instructions are dropped.
   Block-level elements (and ``<br>``/``<hr>``) delimit text blocks;
   inline markup does not.
3. **Within a block**: entities decoded once; soft hyphens (U+00AD)
   removed; a word broken across a source line break with a trailing
   ``-`` is re-joined (ALTO hyphenation-merge analog); all whitespace
   runs collapse to a single space; leading/trailing space stripped.
4. **Across blocks**: non-empty blocks joined with ``'\n'``.
5. **Normalization**: NFC over the final string.
"""

from __future__ import annotations

import codecs
import re
import unicodedata
from html.parser import HTMLParser

__all__ = ["detect_charset", "decode_html", "extract_text"]

_BOMS: tuple[tuple[bytes, str], ...] = (
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)

_CHARSET_RE = re.compile(
    rb"""(?:charset|encoding)\s*=\s*["']?\s*([A-Za-z0-9._\-]+)""", re.IGNORECASE
)

# HTML5 block-level / flow-breaking elements.  Kept explicit and sorted so
# the spec is diffable; mirrors the ALTO TextBlock/TextLine traversal
# boundaries (TextHelper.java:294-327).
_BLOCK_TAGS = frozenset(
    """address article aside blockquote br caption dd details dialog div dl dt
    fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup hr
    li main menu nav ol option p pre section select summary table tbody td
    tfoot th thead title tr ul""".split()
)

_SKIP_TAGS = frozenset({"script", "style", "template", "noscript"})

_SOFT_HYPHEN = "­"
# letter '-' (optional spaces) newline (optional spaces) letter  →  joined.
_HYPHEN_BREAK_RE = re.compile(r"([^\W\d_])-[ \t]*\n[ \t\n]*([^\W\d_])", re.UNICODE)
_WS_RUN_RE = re.compile(r"\s+")


def detect_charset(raw: bytes) -> str:
    """Return the codec name used by :func:`decode_html` for ``raw``.

    Reference analog: ``FileTools.getCharset`` (ICU4j detection) +
    forced UTF-8 conversion (``FileTools.java:114-157``).
    """
    for bom, name in _BOMS:
        if raw.startswith(bom):
            return name
    m = _CHARSET_RE.search(raw[:4096])
    if m:
        label = m.group(1).decode("ascii", "replace").strip().lower()
        try:
            codec = codecs.lookup(label)
        except LookupError:
            codec = None
        if codec is not None:
            return codec.name
    try:
        raw.decode("utf-8", "strict")
        return "utf-8"
    except UnicodeDecodeError:
        return "cp1252"


def decode_html(raw: bytes) -> str:
    """Decode HTML bytes to str per the charset spec (always succeeds)."""
    name = detect_charset(raw)
    for bom, bom_name in _BOMS:
        if bom_name == name and raw.startswith(bom):
            raw = raw[len(bom) :]
            break
    return raw.decode(name, "replace")


class _TextExtractor(HTMLParser):
    """Streaming block collector (ALTO block/line traversal analog)."""

    def __init__(self) -> None:
        # convert_charrefs=True ⇒ entities are decoded exactly once in
        # handle_data (unescapeHtml4 analog, MetadataHelper.java:864-872).
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._pieces: list[str] = []
        self._skip_depth = 0

    # -- structure ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            if self._skip_depth > 0:
                self._skip_depth -= 1
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _BLOCK_TAGS:
            self._flush()

    # -- content -----------------------------------------------------
    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self._pieces.append(data)

    # comments / CDATA / declarations / PIs are dropped entirely
    def handle_comment(self, data: str) -> None:  # pragma: no cover - trivial
        pass

    def handle_decl(self, decl: str) -> None:  # pragma: no cover - trivial
        pass

    def handle_pi(self, data: str) -> None:  # pragma: no cover - trivial
        pass

    def unknown_decl(self, data: str) -> None:  # pragma: no cover - trivial
        pass

    # -- block finalization -----------------------------------------
    def _flush(self) -> None:
        if not self._pieces:
            return
        text = "".join(self._pieces)
        self._pieces.clear()
        text = text.replace(_SOFT_HYPHEN, "")
        text = _HYPHEN_BREAK_RE.sub(r"\1\2", text)
        text = _WS_RUN_RE.sub(" ", text).strip()
        if text:
            self.blocks.append(text)

    def result(self) -> str:
        self._flush()
        return unicodedata.normalize("NFC", "\n".join(self.blocks))


def extract_text(html: bytes | str) -> str:
    """``html`` (bytes or already-decoded str) → canonical text.

    Total function: any input produces a (possibly empty) string.  This
    single function is THE byte-identical-per-url invariant
    (``BASELINE.json:input_hint``); both the Ray extract stage and the
    test oracle call it.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = decode_html(bytes(html))
    parser = _TextExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # html.parser is robust, but extraction must be total: salvage
        # whatever blocks were collected before the malformed region.
        pass
    return parser.result()
