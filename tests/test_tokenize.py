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
