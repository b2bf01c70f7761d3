from goobi_viewer_indexer_ray.functions.tokenize import token_counts, tokenize


def test_basic():
    assert tokenize("Hello, World!") == ["hello", "world"]
    assert tokenize("a,b;c:d") == ["a", "b", "c", "d"]  # Indexer.java:492-498 analog


def test_unicode_and_case():
    assert tokenize("Straße CAFÉ café") == ["straße", "café", "café"]
    assert tokenize("underscore_split") == ["underscore", "split"]
    assert tokenize("42nd 3.14") == ["42nd", "3", "14"]


def test_nfc_in_tokenizer():
    # decomposed input tokenizes to the composed form
    assert tokenize("café") == ["café"]


def test_counts():
    tf, dl = token_counts("a b a c a b")
    assert tf == {"a": 3, "b": 2, "c": 1} and dl == 6
    assert token_counts("") == ({}, 0)


def test_s_stemmer_rules():
    """S-stemmer (Harman 1991) rule-by-rule, including every exception
    class: ies→y (eies/aies kept), es→e (aes/ees/oes skip to rule 3),
    s→'' (us/ss kept)."""
    import numpy as np

    from goobi_viewer_indexer_ray.stages.text_ops import s_stem_array

    cases = {
        "ponies": "pony", "ties": "ty", "eies": "eie", "aies": "aie",
        "tables": "table", "value": "value", "values": "value",
        "caress": "caress", "pass": "pass", "bus": "bus", "census": "census",
        "trees": "tree", "goes": "goe", "cats": "cat", "hashs": "hash",
        "as": "a", "s": "", "x": "x", "glass": "glass",
    }
    got = s_stem_array(np.array(list(cases), dtype=object))
    assert list(got) == list(cases.values())


def test_s_stemmer_merges_fixture_morphology():
    """The (doc_id + pos) % 3 plural fixture must stem back to the
    base vocabulary for every corpus term (the merge the catalog
    entry's df_any measures)."""
    import numpy as np

    from goobi_viewer_indexer_ray.stages.text_ops import s_stem_array

    vocab = ["agg", "batch", "column", "data", "hash", "join", "key",
             "merge", "query", "row", "table", "value", "vector", "window"]
    plural = np.array([w + "s" for w in vocab], dtype=object)
    assert list(s_stem_array(plural)) == vocab
