"""read_alto — TextHelper.readAltoDoc parity pins (handwritten XML,
independent of the gen_alto fixture)."""

from __future__ import annotations

from goobi_viewer_indexer_ray.functions.alto import gen_alto, read_alto


def test_dims_int_float_absent():
    r = read_alto('<alto><Layout><Page WIDTH="120" HEIGHT="90.7"/>'
                  '</Layout></alto>')
    assert r["width"] == 120
    assert r["height"] == 90  # float fallback truncates (ALTO 2.1)
    r2 = read_alto('<alto><Layout><Page/></Layout></alto>')
    assert r2["width"] is None and r2["height"] is None
    r3 = read_alto('<alto><Layout><Page WIDTH="abc"/></Layout></alto>')
    assert r3["width"] is None


def test_no_printspace_means_no_fulltext():
    xml = ('<alto><Layout><Page WIDTH="10">'
           '<TextBlock><TextLine><String CONTENT="x"/></TextLine>'
           '</TextBlock></Page></Layout></alto>')
    assert read_alto(xml)["fulltext"] == ""


def test_block_line_newline_assembly():
    xml = ('<alto><Layout><Page><PrintSpace>'
           '<TextBlock>'
           '<TextLine><String CONTENT="a"/><String CONTENT="b"/></TextLine>'
           '<TextLine><String CONTENT="c"/></TextLine>'
           '</TextBlock>'
           '<TextBlock><TextLine><String CONTENT="d"/></TextLine></TextBlock>'
           '</PrintSpace></Page></Layout></alto>')
    assert read_alto(xml)["fulltext"] == "a b\nc\n\nd\n"


def test_hyphenation_merge_and_double_space_quirk():
    xml = ('<alto><Layout><Page><PrintSpace><TextBlock><TextLine>'
           '<String CONTENT="hyphen-" SUBS_TYPE="HypPart1"'
           ' SUBS_CONTENT="hyphenated"/>'
           '<String CONTENT="ated" SUBS_TYPE="HypPart2"/>'
           '<String CONTENT="tail"/>'
           '</TextLine></TextBlock></PrintSpace></Page></Layout></alto>')
    # HypPart1 -> whole word; HypPart2 skipped AFTER its separator was
    # appended (readAltoTextBlock's count>0 branch) -> double space
    assert read_alto(xml)["fulltext"] == "hyphenated  tail\n"


def test_nested_composed_blocks_order():
    xml = ('<alto><Layout><Page><PrintSpace>'
           '<ComposedBlock>'
           '<ComposedBlock><TextBlock><TextLine>'
           '<String CONTENT="inner"/></TextLine></TextBlock></ComposedBlock>'
           '<TextBlock><TextLine><String CONTENT="outer"/></TextLine>'
           '</TextBlock>'
           '</ComposedBlock>'
           '</PrintSpace></Page></Layout></alto>')
    # TextBlocks of a ComposedBlock are read BEFORE nested
    # ComposedBlocks (handleAltoComposedBlock order)
    assert read_alto(xml)["fulltext"] == "outer\n\ninner\n"


def test_named_entities_shape_and_drops():
    xml = ('<alto><Layout><Page/></Layout><Tags>'
           '<NamedEntityTag TYPE="person" LABEL="Ada" URI="http://a"/>'
           '<NamedEntityTag TYPE="place" LABEL="Ulm"/>'
           '<NamedEntityTag TYPE="person"/>'
           '<NamedEntityTag LABEL="orphan"/>'
           '</Tags></alto>')
    assert read_alto(xml)["named_entities"] == [
        "PERSON###Ada###http://a", "PLACE###Ulm"]


def test_namespaced_alto_parses_identically():
    plain = gen_alto(13)
    ns = plain.replace("<alto>",
                       '<alto xmlns="http://www.loc.gov/standards/alto/ns-v2#">')
    assert read_alto(ns) == read_alto(plain)
