"""Frozen extractor: byte-identical invariant + tokenizer properties."""

from hypothesis import given, settings
from hypothesis import strategies as st

from causalre_spark.extract import extract_text, tokenize
from causalre_spark.sources.corpus import gen_page


def test_byte_identical_on_corpus():
    for i in range(300):
        pg = gen_page(i)
        assert extract_text(pg["html"]) == pg["text"], pg["url"]


def test_extract_deterministic():
    pg = gen_page(7)
    assert extract_text(pg["html"]) == extract_text(pg["html"])


def test_extract_multi_paragraph():
    html = b"<html><body><p>one</p><div>skip</div><p>two &amp; three</p></body></html>"
    assert extract_text(html) == "one\n\ntwo & three"


def test_extract_strips_nested_tags():
    assert extract_text(b"<p>a <b>bold</b> word</p>") == "a bold word"


def test_tokenize_punct_split():
    assert tokenize("Heavy rain caused flooding.") == [
        "Heavy", "rain", "caused", "flooding", "."]
    assert tokenize('"quoted," he said') == ['"', "quoted", ",", '"', "he", "said"]


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=200))
def test_tokenize_total_and_stable(s):
    toks = tokenize(s)
    assert toks == tokenize(s)
    assert all(t for t in toks)  # no empty tokens
