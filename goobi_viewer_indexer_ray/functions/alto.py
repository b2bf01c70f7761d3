"""ALTO OCR document reader — ``TextHelper.readAltoDoc`` parity.

Decision-for-decision transposition of the reference's ALTO handling
(`helper/TextHelper.java:159-245` ``readAltoDoc``, ``:249-269``
``handleAltoComposedBlock``, ``:289-321`` ``readAltoTextBlock``,
``:276-287`` ``createSimpleNamedEntityTag``):

- page WIDTH/HEIGHT parsed as int, FLOAT fallback truncating toward
  zero (ALTO 2.1 emits floats — ``TextHelper.java:172-199``), absent
  attribute → ``None``;
- text is collected ONLY under ``Layout/Page/PrintSpace`` blocks
  (``:201-221`` — no PrintSpace, no fulltext);
- ``TextBlock``: one fulltext line per ``TextLine``; a ``'\\n'`` is
  prepended for every new line when text already exists, and ONE
  ``'\\n'`` appended after each block that produced text;
- hyphenation: a word with ``SUBS_TYPE="HypPart1"`` contributes its
  ``SUBS_CONTENT`` (the re-joined whole word), ``HypPart2`` is
  skipped — but the inter-word space is appended BEFORE the skip
  check, so a skipped part leaves a double space.  That quirk is
  faithful (``readAltoTextBlock``'s ``count > 0`` space precedes the
  SUBS_TYPE branch) and pinned in pytest;
- ``ComposedBlock``: contained TextBlocks first, then nested
  ComposedBlocks, recursively;
- named entities from ``Tags/NamedEntityTag``:
  ``TYPE.upper() + "###" + LABEL (+ "###" + URI if non-empty)``;
  tags missing TYPE or LABEL are dropped.

The parser is stdlib ``ElementTree`` (namespace-agnostic local-name
matching, like the reference's ``getChild(name, null)`` lookups).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

__all__ = ["read_alto", "gen_alto"]


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _children(ele, name: str):
    return [c for c in ele if _local(c.tag) == name]


def _child(ele, name: str):
    cs = _children(ele, name)
    return cs[0] if cs else None


def _parse_dim(val: str | None) -> int | None:
    """int first, float-truncate fallback (TextHelper.java:172-199)."""
    if val is None:
        return None
    try:
        return int(val)
    except ValueError:
        try:
            return int(float(val))
        except ValueError:
            return None


def _read_text_block(ele_block, parts: list[str]) -> None:
    """readAltoTextBlock (TextHelper.java:289-321)."""
    for line in _children(ele_block, "TextLine"):
        words = _children(line, "String")
        if not words:
            continue
        if parts:
            parts.append("\n")
        count = 0
        for w in words:
            if count > 0:
                parts.append(" ")  # BEFORE the skip check — the quirk
            st = w.get("SUBS_TYPE")
            if st == "HypPart1":
                parts.append(w.get("SUBS_CONTENT") or "")
            elif st != "HypPart2":
                parts.append(w.get("CONTENT") or "")
            count += 1
    if parts:
        parts.append("\n")


def _read_composed_block(ele, parts: list[str]) -> None:
    """handleAltoComposedBlock: TextBlocks first, then nested
    ComposedBlocks (TextHelper.java:249-269)."""
    for tb in _children(ele, "TextBlock"):
        _read_text_block(tb, parts)
    for cb in _children(ele, "ComposedBlock"):
        _read_composed_block(cb, parts)


def read_alto(xml: str) -> dict:
    """ALTO XML → ``{fulltext, width, height, named_entities}``."""
    root = ET.fromstring(xml)
    width = height = None
    parts: list[str] = []
    layout = _child(root, "Layout")
    page = _child(layout, "Page") if layout is not None else None
    if page is not None:
        width = _parse_dim(page.get("WIDTH"))
        height = _parse_dim(page.get("HEIGHT"))
        for ps in _children(page, "PrintSpace"):
            for block in ps:
                name = _local(block.tag)
                if name == "TextBlock":
                    _read_text_block(block, parts)
                elif name == "ComposedBlock":
                    _read_composed_block(block, parts)
    entities: list[str] = []
    tags = _child(root, "Tags")
    if tags is not None:
        for t in _children(tags, "NamedEntityTag"):
            ne_type, ne_label = t.get("TYPE"), t.get("LABEL")
            ne_uri = t.get("URI")
            if ne_type is None or ne_label is None:
                continue  # createSimpleNamedEntityTag returns null
            entities.append(ne_type.upper() + "###" + ne_label
                            + ("###" + ne_uri if ne_uri else ""))
    return {"fulltext": "".join(parts), "width": width, "height": height,
            "named_entities": entities}


# --------------------------------------------------------------- synth

def _w(k: int, i: int) -> str:
    return f"w{(k * 7 + i) % 50}"


def gen_alto(k: int) -> str:
    """Deterministic ALTO fixture for doc key ``k`` — every branch of
    :func:`read_alto` is reachable by key residue:

    - ``k % 7 == 0`` → WIDTH/HEIGHT absent; ``k % 5 == 0`` → float
      dims (ALTO 2.1); else int dims ``100+k`` / ``200+k``;
    - ``k % 11 == 0`` → NO PrintSpace (empty fulltext);
    - ``k % 3 == 0`` → line 1 starts with a hyphenated pair
      (HypPart1/HypPart2 — double-space quirk);
    - entity 1 carries a URI iff ``k`` is even; a TYPE-less decoy tag
      is always present (must be dropped).
    """
    if k % 7 == 0:
        dims = ""
    elif k % 5 == 0:
        dims = f' WIDTH="{100 + k}.0" HEIGHT="{200 + k}.0"'
    else:
        dims = f' WIDTH="{100 + k}" HEIGHT="{200 + k}"'
    if k % 3 == 0:
        whole = _w(k, 0) + _w(k, 1)
        l1 = (f'<String CONTENT="{_w(k, 0)}-" SUBS_TYPE="HypPart1"'
              f' SUBS_CONTENT="{whole}"/>'
              f'<String CONTENT="{_w(k, 1)}" SUBS_TYPE="HypPart2"/>'
              f'<String CONTENT="{_w(k, 2)}"/>')
    else:
        l1 = "".join(f'<String CONTENT="{_w(k, i)}"/>' for i in range(3))
    l2 = "".join(f'<String CONTENT="{_w(k, i)}"/>' for i in (3, 4, 5))
    ps = ""
    if k % 11 != 0:
        ps = (
            "<PrintSpace>"
            f"<TextBlock><TextLine>{l1}</TextLine>"
            f"<TextLine>{l2}</TextLine></TextBlock>"
            f'<TextBlock><TextLine><String CONTENT="{_w(k, 6)}"/>'
            f'<String CONTENT="{_w(k, 7)}"/></TextLine></TextBlock>'
            "<ComposedBlock>"
            f'<TextBlock><TextLine><String CONTENT="{_w(k, 8)}"/>'
            f'<String CONTENT="{_w(k, 9)}"/></TextLine></TextBlock>'
            "<ComposedBlock><TextBlock><TextLine>"
            f'<String CONTENT="{_w(k, 10)}"/>'
            "</TextLine></TextBlock></ComposedBlock>"
            "</ComposedBlock>"
            "</PrintSpace>"
        )
    uri = f' URI="http://ex/{k}"' if k % 2 == 0 else ""
    return (
        "<alto>"
        f"<Layout><Page{dims}>{ps}</Page></Layout>"
        "<Tags>"
        f'<NamedEntityTag TYPE="person" LABEL="p{k % 10}"{uri}/>'
        f'<NamedEntityTag TYPE="place" LABEL="q{k % 4}"/>'
        '<NamedEntityTag LABEL="dropme"/>'
        "</Tags>"
        "</alto>"
    )
