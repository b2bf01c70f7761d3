"""Authority-data record normalization — NORM_* field synthesis.

Transposes the reference's GND/VIAF authority-record handling,
decision-for-decision:

- ``MetadataHelper.parseAuthorityMetadata`` (``MetadataHelper.java:
  565-703``): the NORM_* routing rules — language-suffix filtering
  with preferred-language override, name/place search-field
  aggregation with value dedup, LIFEPERIOD date splitting, coordinate
  conversion to WKT, ``_UNTOKENIZED`` twins, and the DEFAULT /
  NORMDATATERMS bags;
- ``MetadataHelper.sanitizeAuthorityUrl`` (``:1195-1208``) and the
  bare-identifier → GND-url promotion (``retrieveAuthorityData``,
  ``:484-487``);
- ``MetadataHelper.extractLanguageCodeFromMetadataField``
  (``:1516-1528``): ``_LANG_XX`` suffix, exactly two trailing chars;
- ``MetadataHelper.addValueToDefault`` (``:1485-1497``): the
  space-wrapped containment dedup for the bags.

The record fetch itself is an actor-pool stage
(:class:`stages.authority.NormalizeAuthority`) reusing the TTL cache
(the reference's ``authorityDataCache``) and the pluggable transport
(:class:`stages.fetch.RecordedTransport` in tests — this sandbox has
no network).  This module is the PURE logic: a list of authority
``(key, value)`` fields in, a list of synthesized ``(field, value)``
rows out — one Python call per authority record, vectorization-free
by design (records are tiny; the distribution axis is the record
stream, not the per-record field list).
"""

from __future__ import annotations

import unicodedata

from ..stages.geo import convert_coords

__all__ = [
    "sanitize_authority_url",
    "extract_language_code",
    "parse_authority_fields",
    "FIELD_NORM_NAME",
    "FIELD_WKT_COORDS",
    "FIELD_HAS_WKT_COORDS",
    "AUTOCOORDS_FIELD",
]

MIDFIX_LANG = "_LANG_"
SUFFIX_UNTOKENIZED = "_UNTOKENIZED"
FIELD_NORM_NAME = "NORM_NAME"
FIELD_WKT_COORDS = "WKT_COORDS"
FIELD_HAS_WKT_COORDS = "BOOL_WKT_COORDS"
# the reference reads this constant from the intranda normdata lib
# (Record.AUTOCOORDS_FIELD); the lib is not vendored in the reference
# repo, so the engine pins its own spelling
AUTOCOORDS_FIELD = "NORM_COORDS"
GND_URL_PREFIX = "https://d-nb.info/gnd/"


def sanitize_authority_url(url: str | None) -> str:
    """``sanitizeAuthorityUrl`` + the bare-id → GND promotion: a
    non-http value is assumed to be a GND identifier
    (``retrieveAuthorityData``, ``MetadataHelper.java:484-487``);
    newline-containing urls keep only their first line."""
    if url is None:
        return ""
    u = url.strip()
    if not u:
        return ""
    if "\n" in u or "\r" in u:
        u = u.replace("\r", "\n").split("\n", 1)[0].strip()
    if u and not u.startswith("http"):
        u = GND_URL_PREFIX + u
    return u


def extract_language_code(field: str | None) -> str | None:
    """``_LANG_XX`` suffix (exactly two trailing chars) → ``xx``."""
    if not field or MIDFIX_LANG not in field:
        return None
    idx = field.index(MIDFIX_LANG) + len(MIDFIX_LANG)
    if len(field) == idx + 2:
        return field[idx:].lower()
    return None


def _add_to_bag(bag: str, value: str) -> str:
    """``addValueToDefault``'s space-wrapped containment dedup —
    the accumulator is a STRING appended ``" v "`` at a time (double
    inner spaces), exactly like the reference's StringBuilder: the
    containment check's corner cases depend on that spacing."""
    v = value.strip()
    if f" {v} " not in bag:
        bag += f" {v} "
    return bag


def parse_authority_fields(
    fields: list[tuple[str, str | None]],
    *,
    label_field: str = "",
    add_to_default: tuple[str, ...] | list[str] = (),
    replace_rules: list[tuple[str, str]] | None = None,
) -> tuple[list[tuple[str, str]], str, str]:
    """``parseAuthorityMetadata`` transposed.

    ``fields``: the authority record's (key, value) pairs in record
    order.  Returns ``(rows, default_bag, normdataterms_bag)`` where
    ``rows`` is the synthesized (field, value) list in the reference's
    emission order (duplicates preserved) and the bags are the
    space-joined DEFAULT / NORMDATATERMS accumulations.
    """
    language = extract_language_code(label_field) if label_field else None

    ret: list[tuple[str, str]] = []       # direct emissions (dates, coords)
    temp: list[tuple[str, str]] = []      # buffered for the language pass
    name_seen: set[str] = set()
    place_seen: set[str] = set()
    lang_override: dict[str, list[str]] = {}
    default_bag = ""
    terms_bag = ""
    has_wkt = False

    for key, raw in fields:
        if not key or not key.startswith("NORM_"):
            continue
        field_lang = extract_language_code(key)
        if raw is None or not str(raw).strip() or key == "NORM_STATICPAGE":
            continue  # the IKFN browsing hack (MetadataHelper.java:593-596)
        value = unicodedata.normalize("NFC", str(raw))  # normalizeSequence
        for pat, repl in replace_rules or []:
            value = value.replace(pat, repl)

        if add_to_default and key in add_to_default:
            default_bag = _add_to_bag(default_bag, value)
        if not key.startswith("NORM_URI"):
            terms_bag = _add_to_bag(terms_bag, value)

        # language routing: values in a language other than the main
        # field's are dropped; matching-language values also feed the
        # override map (MetadataHelper.java:621-627)
        if field_lang and field_lang != language:
            continue
        if field_lang and field_lang == language:
            lang_override.setdefault(key, []).append(value)
        temp.append((key, value))

        if key == FIELD_NORM_NAME or (
            (key.startswith("NORM_ALTNAME") or key.startswith("NORM_OFFICIALNAME"))
            and value not in name_seen
        ):
            if label_field:
                temp.append((f"{label_field}_NAME_SEARCH", value))
            temp.append((FIELD_NORM_NAME + SUFFIX_UNTOKENIZED, value))
            name_seen.add(value)
        elif key.startswith("NORM_PLACE") and value not in place_seen:
            if label_field:
                temp.append((f"{label_field}_PLACE_SEARCH", value))
            temp.append(("NORM_PLACE" + SUFFIX_UNTOKENIZED, value))
            place_seen.add(value)
        elif key == "NORM_LIFEPERIOD":
            for part in value.split("-"):
                part = part.strip()
                if not part:
                    continue
                if label_field:
                    ret.append((f"{label_field}_DATE_SEARCH", part))
                ret.append(("NORM_DATE" + SUFFIX_UNTOKENIZED, part))
        elif key == AUTOCOORDS_FIELD:
            kind, wkt, *_rest, bool_wkt = convert_coords(value)
            if kind != "unknown":
                ret.append((FIELD_WKT_COORDS, wkt))
                has_wkt = True

    # preferred-language override: NORM_FOO values replaced by
    # NORM_FOO_LANG_XX's where present (MetadataHelper.java:676-698)
    done: set[str] = set()
    for field, value in temp:
        if field in done:
            continue
        if language is not None and extract_language_code(field) is None:
            values = lang_override.get(f"{field}{MIDFIX_LANG}{language.upper()}")
            if values is not None:
                for v in values:
                    ret.append((field, v))
                    ret.append((field + SUFFIX_UNTOKENIZED, v))
                done.add(field)
                continue
        ret.append((field, value))
        if not field.endswith(SUFFIX_UNTOKENIZED) and not field.endswith("_SEARCH"):
            ret.append((field + SUFFIX_UNTOKENIZED, value))

    ret.append((FIELD_HAS_WKT_COORDS, "true" if has_wkt else "false"))
    return ret, default_bag.strip(), terms_bag.strip()
