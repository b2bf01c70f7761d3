"""Config-driven metadata field extraction — the M2 DSL.

The reference's core map is an XPath→field mapping DSL with ~248
configured fields and per-field transform options
(``helper/MetadataHelper.java:113-463`` driven by
``model/config/FieldConfig.java:41-71``; full option surface in
SURVEY.md §2.4).  Transposed to web pages: selectors address HTML
landmarks instead of XPath nodes, and the option surface keeps the
same semantics under the same names:

- ``selector``: one of the supported landmark selectors (first
  non-empty wins across the list — the reference's xpath-list
  ``getnode=first`` rule, ``MetadataHelper.java:218-221``);
- ``constant_value``                (FieldConfig.constantValue)
- ``replace_rules``: literal or ``REGEX:``-prefixed
                                    (MetadataHelper.java:823-854)
- ``lowercase``, ``value_prefix``/``value_postfix``, ``one_token``
  (strip non-word chars — MetadataHelper.java:961-973), ``one_field``
  with separator (``" ; "`` default — FieldConfig.java:39),
  ``non_sort_prefixes`` (bracket removal), ``normalize_value``
  (pad/truncate to fixed length — ValueNormalizer.java:81-220),
- ``add_sort_field`` → single-valued ``SORT_<name>`` from the first
  value (MetadataHelper.java:917-950),
- ``add_untokenized`` → ``<name>_UNTOKENIZED`` copy,
- ``add_existence_bool`` → ``BOOL_<name>``
  (IndexObject.applyFinalModifications, :503-532),
- ``add_to_default`` → space-joined DEFAULT bag with dedup
  (MetadataHelper.java:1485-1506),
- ``multivalued`` / ``allow_duplicate_values`` dedup-by-first
  (IndexObject.java:388-399).

Pure functions over the decoded HTML string; the Ray stage in
``stages/fields.py`` applies a rule set per batch.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field
from html.parser import HTMLParser

__all__ = ["FieldRule", "EntitySpec", "extract_landmarks", "apply_rules",
           "apply_rules_with_entities", "extract_entities", "interpolate_years",
           "DEFAULT_RULES"]

_WS = re.compile(r"\s+")

ACCESS_FIELD = "ACCESSCONDITION"
OPENACCESS = "OPENACCESS"  # the reference's open-access default value


class _LandmarkParser(HTMLParser):
    """Collects the selector-addressable landmarks of a page."""

    _CAPTURE = {"title", "h1", "h2", "h3", "a", "p", "li"}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.meta: dict[str, str] = {}
        self.values: dict[str, list[str]] = {t: [] for t in self._CAPTURE}
        self.lang_attr: str | None = None
        self._stack: list[tuple[str, list[str]]] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        ad = dict(attrs)
        if tag in ("script", "style", "template", "noscript"):
            self._skip += 1
        elif tag == "meta":
            name = (ad.get("name") or ad.get("property") or "").lower()
            if name and ad.get("content") is not None:
                self.meta.setdefault(name, ad["content"])
        elif tag == "html" and ad.get("lang"):
            self.lang_attr = ad["lang"]
        elif tag in self._CAPTURE:
            self._stack.append((tag, []))

    def handle_endtag(self, tag):
        if tag in ("script", "style", "template", "noscript"):
            self._skip = max(0, self._skip - 1)
        elif self._stack and self._stack[-1][0] == tag:
            _, pieces = self._stack.pop()
            text = _WS.sub(" ", "".join(pieces)).strip()
            if text:
                self.values[tag].append(text)

    def handle_data(self, data):
        if self._skip == 0 and self._stack:
            self._stack[-1][1].append(data)


def extract_landmarks(html_text: str) -> dict:
    """Decoded HTML → landmark dict (title, meta.*, h1..h3, a, p, li, lang)."""
    p = _LandmarkParser()
    try:
        p.feed(html_text)
        p.close()
    except Exception:
        pass
    while p._stack:  # unclosed capture tags at EOF
        tag, pieces = p._stack.pop()
        text = _WS.sub(" ", "".join(pieces)).strip()
        if text:
            p.values[tag].append(text)
    out = {f"meta.{k}": [v] for k, v in p.meta.items()}
    out.update({k: v for k, v in p.values.items()})
    if p.lang_attr:
        out["html.lang"] = [p.lang_attr]
    return out


@dataclass
class EntitySpec:
    """``group_entity`` config (GroupedMetadata.java analog): a regex
    whose named groups become the sub-entity's own fields.

    The reference emits a separate METADATA doc per grouped entity
    (person/event) with its own subfields, linked to the owner record
    (``model/GroupedMetadata.java:143-227``, ``Indexer.java:1335``).
    Transposed: each pattern match over a rule's values yields one
    child entity record ``{ENTITY_TYPE, MD_VALUE, <GROUP>: ...}``; the
    owner keeps ``MD_VALUE`` as its flat field value.
    """

    pattern: str
    type_name: str = "METADATA"


@dataclass
class FieldRule:
    """One configured output field (the FieldConfig.java analog)."""

    name: str
    selectors: list[str] = field(default_factory=list)  # first non-empty wins
    constant_value: str | None = None
    multivalued: bool = True
    allow_duplicate_values: bool = False
    split_separator: str | None = None  # the {SPLIT} option (MetadataHelper.java:745-753)
    replace_rules: list[tuple[str, str]] = field(default_factory=list)
    lowercase: bool = False
    one_token: bool = False
    one_field: bool = False
    one_field_separator: str = " ; "
    value_prefix: str = ""
    value_postfix: str = ""
    non_sort_prefixes: list[tuple[str, str]] = field(default_factory=list)  # (open, close)
    normalize_length: int | None = None  # ValueNormalizer: pad/truncate
    normalize_filler: str = "0"
    normalize_position: str = "front"  # or "rear"
    interpolate_years: bool = False  # fill year gaps (MetadataHelper.java:429-435)
    group_entity: EntitySpec | None = None
    add_sort_field: bool = False
    add_untokenized: bool = False
    add_existence_bool: bool = False
    add_to_default: bool = False


_NON_WORD = re.compile(r"[\W_]+", re.UNICODE)


def _apply_replace_rules(value: str, rules: list[tuple[str, str]]) -> str:
    # MetadataHelper.applyReplaceRules: literal char/string or REGEX: pattern
    for key, repl in rules:
        if key.startswith("REGEX:"):
            value = re.sub(key[len("REGEX:"):], repl, value)
        else:
            value = value.replace(key, repl)
    return value


def _remove_non_sort(value: str, pairs: list[tuple[str, str]]) -> str:
    for open_, close in pairs:
        while True:
            i = value.find(open_)
            if i < 0:
                break
            j = value.find(close, i + len(open_))
            if j < 0:
                break
            value = value[:i] + value[j + len(close):]
    return _WS.sub(" ", value).strip()


def _normalize_value(value: str, rule: FieldRule) -> str:
    # ValueNormalizer.java:81-220 — pad or truncate to a target length
    n = rule.normalize_length
    if n is None:
        return value
    if len(value) > n:
        return value[-n:] if rule.normalize_position == "front" else value[:n]
    pad = rule.normalize_filler * (n - len(value))
    return pad + value if rule.normalize_position == "front" else value + pad


MAX_YEAR_SPAN = 2000  # refuse to range wider than two millennia


def interpolate_years(values: list[str]) -> list[str]:
    """Fill gaps between the min and max numeric year
    (``MetadataHelper.java:429-435``): ["1990", "1993"] →
    ["1990", "1991", "1992", "1993"].  Non-numeric values pass
    through unchanged, appended after the interpolated range.

    The span is capped at :data:`MAX_YEAR_SPAN`: the reference only
    applies completeYears to the YEAR field, but any rule here can
    enable it, so a field containing two far-apart numbers (an ID next
    to a year) must not explode into a multi-million-element list —
    wider ranges pass through un-interpolated (sorted, deduped)."""
    years = sorted({int(v) for v in values if v.lstrip("-").isdigit()})
    rest = [v for v in values if not v.lstrip("-").isdigit()]
    if len(years) < 2 or years[-1] - years[0] > MAX_YEAR_SPAN:
        return [str(y) for y in years] + rest
    return [str(y) for y in range(years[0], years[-1] + 1)] + rest


def extract_entities(value: str, spec: EntitySpec) -> list[dict[str, str]]:
    """One value → child entity records per pattern match; named groups
    become subfields (uppercased, ``MD_`` style left to the pattern
    author).  The GroupedMetadata transposition's core."""
    out = []
    for m in re.finditer(spec.pattern, value):
        ent = {"ENTITY_TYPE": spec.type_name, "MD_VALUE": m.group(0)}
        for k, g in (m.groupdict() or {}).items():
            if g is not None:
                ent[k.upper()] = g
        out.append(ent)
    return out


def apply_rules(html_text: str, rules: list[FieldRule]) -> dict[str, list[str]]:
    """Decoded HTML + rule set → ``{field: [values]}`` (entity records
    dropped — see :func:`apply_rules_with_entities`)."""
    return apply_rules_with_entities(html_text, rules)[0]


def apply_rules_with_entities(
    html_text: str, rules: list[FieldRule]
) -> tuple[dict[str, list[str]], list[dict[str, str]]]:
    """Decoded HTML + rule set → (``{field: [values]}``, entity records).

    Mirrors ``MetadataHelper.retrieveElementMetadata`` semantics: per
    rule, first non-empty selector wins; transform chain: {SPLIT} →
    replace rules → non-sort → prefix/postfix → lowercase → one_token
    → normalize (unescape happened at parse).  DELIBERATE ordering
    divergence from the reference: it splits at addToLucene time AFTER
    all transforms (``MetadataHelper.java:745-753``), i.e. per-whole-
    value; here {SPLIT} runs FIRST so prefixes/normalization apply
    per-fragment — the more useful semantics for multi-value web
    fields, documented rather than hidden.  ``interpolate_years`` also
    re-sorts the numeric values (the reference only appends missing
    in-between values); both behaviors are pinned by tests.
    Then dedup unless allowed; year interpolation; then the derived
    SORT_/UNTOKENIZED/BOOL_/DEFAULT outputs.  Rules with
    ``group_entity`` additionally emit one child record per pattern
    match (owner keeps the match text as its flat value — the
    GroupedMetadata METADATA-doc analog).
    """
    landmarks = extract_landmarks(unicodedata.normalize("NFC", html_text))
    out: dict[str, list[str]] = {}
    entities: list[dict[str, str]] = []
    default_bag: list[str] = []

    for rule in rules:
        if rule.constant_value is not None:
            values = [rule.constant_value]
        else:
            values = []
            for sel in rule.selectors:
                values = list(landmarks.get(sel, []))
                if values:
                    break
        if rule.split_separator:  # the {SPLIT} option
            values = [p.strip() for v in values for p in v.split(rule.split_separator)
                      if p.strip()]
        cooked: list[str] = []
        for v in values:
            v = _apply_replace_rules(v, rule.replace_rules)
            v = _remove_non_sort(v, rule.non_sort_prefixes)
            v = rule.value_prefix + v + rule.value_postfix
            if rule.lowercase:
                v = v.lower()
            if rule.one_token:
                v = _NON_WORD.sub("", v)
            v = _normalize_value(v, rule)
            if v:
                cooked.append(v)
        if rule.group_entity is not None:
            ents: list[dict[str, str]] = []
            for v in cooked:
                ents.extend(extract_entities(v, rule.group_entity))
            for i, e in enumerate(ents):
                e["OWNER_FIELD"] = rule.name
                e["POS"] = str(i)
            entities.extend(ents)
            cooked = [e["MD_VALUE"] for e in ents]
        if rule.interpolate_years:
            cooked = interpolate_years(cooked)
        if not rule.allow_duplicate_values:  # dedup keep-first (IndexObject:388)
            seen: set[str] = set()
            cooked = [v for v in cooked if not (v in seen or seen.add(v))]
        if not rule.multivalued:
            cooked = cooked[:1]
        if rule.one_field and cooked:
            cooked = [rule.one_field_separator.join(cooked)]
        if cooked:
            out[rule.name] = cooked
            if rule.add_sort_field:
                out[f"SORT_{rule.name}"] = [cooked[0]]
            if rule.add_untokenized:
                out[f"{rule.name}_UNTOKENIZED"] = list(cooked)
            if rule.add_to_default:
                for v in cooked:
                    if v not in default_bag:
                        default_bag.append(v)
        if rule.add_existence_bool:
            out[f"BOOL_{rule.name}"] = ["true" if cooked else "false"]

    if default_bag:
        out["DEFAULT"] = [" ".join(default_bag)]

    # M15 access-condition propagation: every record carries an
    # ACCESSCONDITION (default OPENACCESS — IndexObject.java:184-202,
    # AbstractWriteStrategy.java:113-117); child entity records inherit
    # ALL the owner's conditions unless they declared their own
    # (MetsIndexer.addAccessConditionToPage copies the full set,
    # :989-1017) — joined with "; " because entity subfields are flat
    # strings here, where the reference emits one field instance per
    # condition.
    if not out.get(ACCESS_FIELD):
        out[ACCESS_FIELD] = [OPENACCESS]
    for e in entities:
        e.setdefault(ACCESS_FIELD, "; ".join(out[ACCESS_FIELD]))
    return out, entities


# A representative default rule set (config_indexer.xml analog).
DEFAULT_RULES: list[FieldRule] = [
    FieldRule(name="MD_TITLE", selectors=["title", "h1", "meta.og:title"],
              multivalued=False, add_sort_field=True, add_to_default=True,
              non_sort_prefixes=[("<<", ">>")]),
    FieldRule(name="MD_DESCRIPTION", selectors=["meta.description", "meta.og:description"],
              multivalued=False, add_to_default=True),
    FieldRule(name="MD_HEADINGS", selectors=["h2"], add_untokenized=True,
              add_to_default=True),
    FieldRule(name="MD_LANGUAGE", selectors=["html.lang", "meta.language"],
              multivalued=False, lowercase=True, add_existence_bool=True),
    FieldRule(name="MD_SOURCE", constant_value="web"),
    # records may declare restrictions via a meta tag; absent → the
    # engine-level OPENACCESS default (M15)
    FieldRule(name=ACCESS_FIELD, selectors=["meta.access", "meta.rights"]),
]


# ------------------------------------------------- roman numerals (M9)

_ROMAN_VALS = {"i": 1, "v": 5, "x": 10, "l": 50, "c": 100, "d": 500,
               "m": 1000}
_ROMAN_DIGITS = (
    ("m", 1000), ("cm", 900), ("d", 500), ("cd", 400), ("c", 100),
    ("xc", 90), ("l", 50), ("xl", 40), ("x", 10), ("ix", 9), ("v", 5),
    ("iv", 4), ("i", 1),
)


def int_to_roman(n: int) -> str:
    """Canonical lowercase roman numeral, 1..3999
    (``RomanNumeral.java`` parity — the viewer's front-matter page
    labels: i, ii, …, xii)."""
    if not 1 <= n <= 3999:
        raise ValueError(f"roman range is 1..3999, got {n}")
    out = []
    for sym, val in _ROMAN_DIGITS:
        while n >= val:
            out.append(sym)
            n -= val
    return "".join(out)


def roman_to_int(s: str) -> int | None:
    """Roman numeral → int via the standard subtractive rule (a
    symbol smaller than its successor is negated) — the
    ``ValueNormalizer.java`` convertRoman option.  Returns ``None``
    for strings containing non-roman chars (the caller's
    arabic/other fallback path)."""
    low = s.lower()
    if not low or any(c not in _ROMAN_VALS for c in low):
        return None
    vals = [_ROMAN_VALS[c] for c in low]
    total = 0
    for i, v in enumerate(vals):
        total += -v if i + 1 < len(vals) and v < vals[i + 1] else v
    return total
