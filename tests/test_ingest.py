"""Chunking pipeline and PDF extraction tests (reference semantics:
rag_engine.rs:1102-1357, 949-1090)."""

import pytest

from rust_local_rag_tpu.ingest import (
    chunk_text,
    extract_sentences,
    approximate_token_count,
    is_heading,
    extract_pdf_text,
)
from rust_local_rag_tpu.ingest.chunking import normalize_whitespace, split_sentences
from rust_local_rag_tpu.ingest.pdf import PdfExtractionError
import pdfgen


# ----- token estimation (rag_engine.rs:1346-1357) -----

def test_token_count_empty():
    assert approximate_token_count("") == 0
    assert approximate_token_count("   ") == 0


def test_token_count_char_dominant():
    # 20 chars, 1 word -> max(ceil(20/4), ceil(0.9)) = 5
    assert approximate_token_count("a" * 20) == 5


def test_token_count_word_dominant():
    # "a b c d e f g h i j" -> 19 chars -> ceil=5 ; 10 words*0.9 -> 9
    assert approximate_token_count("a b c d e f g h i j") == 9


def test_token_count_minimum_one():
    assert approximate_token_count("ab") == 1


# ----- heading detection (rag_engine.rs:1306-1338) -----

def test_heading_all_caps():
    assert is_heading("INTRODUCTION")
    assert is_heading("RISK FACTORS AND MITIGATION")


def test_heading_colon():
    assert is_heading("Summary of results:")


def test_heading_numbered():
    assert is_heading("1. Introduction to the topic here")
    assert not is_heading("1.Introduction")  # needs whitespace after dot


def test_heading_short_titlecase():
    # the uppercase>=lowercase rule only fires for <=4 words
    assert not is_heading("Market Risk")  # upper 2 < lower 8
    assert is_heading("AB Cd")            # upper 3 >= lower 1
    assert not is_heading("lowercase words here okay no")  # 5 words, no caps


def test_heading_rejections():
    assert not is_heading("")
    assert not is_heading("x" * 121)
    assert not is_heading(
        "This is a long sentence with many many words that goes on and on beyond twelve"
    )


# ----- sentence splitting -----

def test_split_basic():
    parts = split_sentences("First sentence here. Second sentence there. Third one.")
    assert parts == ["First sentence here.", "Second sentence there.", "Third one."]


def test_split_abbreviations():
    parts = split_sentences("Dr. Smith met Mr. Jones. They talked.")
    assert parts == ["Dr. Smith met Mr. Jones.", "They talked."]


def test_split_decimals():
    parts = split_sentences("The rate is 3.14 percent. It rose later.")
    assert parts == ["The rate is 3.14 percent.", "It rose later."]


def test_split_initials():
    parts = split_sentences("J. Smith wrote this. K. Jones agreed.")
    assert parts == ["J. Smith wrote this.", "K. Jones agreed."]


def test_split_question_exclamation():
    parts = split_sentences("Really? Yes! Good.")
    assert parts == ["Really?", "Yes!", "Good."]


# ----- sentence extraction with pages/headings -----

def test_extract_sentences_pages_and_headings():
    text = (
        "INTRODUCTION\n\n"
        "First sentence on page one. Second sentence follows.\n\n"
        "\x0c"
        "METHODS\n\n"
        "Page two sentence here."
    )
    sents = extract_sentences(text)
    assert [s.page for s in sents] == [1, 1, 2]
    assert sents[0].heading == "INTRODUCTION"
    assert sents[2].heading == "METHODS"
    assert [s.index for s in sents] == [0, 1, 2]


def test_extract_sentences_fallback_whole_text():
    sents = extract_sentences("just some words without structure")
    assert len(sents) == 1
    assert sents[0].page == 1


def test_extract_sentences_empty():
    assert extract_sentences("") == []
    assert extract_sentences("\n\n\x0c\n\n") == []


# ----- chunk windows (rag_engine.rs:1102-1141) -----

def _sentences_text(n, words_per=12):
    # each sentence ~ words_per words -> tokens ~ ceil(words*0.9);
    # capitalized starts so the sentence splitter sees boundaries
    return " ".join(
        " ".join(f"Word{i}x{j}" for j in range(words_per)) + "." for i in range(n)
    )


def test_chunk_budget_and_overlap():
    text = _sentences_text(20)
    frags = chunk_text(text, chunk_tokens=40)
    assert len(frags) > 1
    # overlap metadata: all but possibly the last carry overlap=2
    for f in frags[:-1]:
        assert f.metadata["overlap_with_previous"] == 2
    # consecutive chunks share 2 sentences of text
    for a, b in zip(frags, frags[1:]):
        a_sents = a.text.split(". ")
        b_sents = b.text.split(". ")
        assert a_sents[-2].strip(".") in b.text or a_sents[-1].strip(".") in b.text
        del b_sents


def test_chunk_sentence_ranges_monotonic():
    # budget must exceed the 2-sentence overlap sum (2 x 24 tokens), else
    # every window re-triggers immediately (same behavior as the reference)
    frags = chunk_text(_sentences_text(15), chunk_tokens=60)
    ranges = [f.metadata["sentence_range"] for f in frags]
    for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
        assert s2 <= e1 + 1  # overlap or adjacency
        assert s2 > s1
        # the final chunk may be the trailing overlap window, ending on the
        # same last sentence as its predecessor (reference behavior)
        assert e2 >= e1


def test_chunk_page_metadata():
    text = "Alpha sentence one here. Beta sentence two here.\x0cGamma page two sentence."
    frags = chunk_text(text, chunk_tokens=10_000)
    assert len(frags) == 1
    assert frags[0].metadata["page_range"] == (1, 2)
    assert frags[0].page_number == 1


def test_chunk_section_title_truncated():
    heading = "A" * 200
    text = heading + "\n\nBody sentence goes here with enough words."
    frags = chunk_text(text, chunk_tokens=100)
    # heading line is >120 bytes so not a heading; craft a valid long one
    heading = ("WORD " * 11 + "WORD:")[:120]
    text = heading + "\n\nBody sentence goes here with enough words."
    frags = chunk_text(text, chunk_tokens=100)
    assert frags
    title = frags[0].metadata["section_title"]
    if title is not None:
        assert len(title) <= 160


def test_chunk_empty_text():
    assert chunk_text("", 200) == []


def test_normalize_whitespace():
    assert normalize_whitespace("  a\t b\n\nc  ") == "a b c"


# ----- PDF extraction -----

def test_pdf_roundtrip_single_page():
    pdf = pdfgen.make_pdf(["Hello world. This is a test document."])
    text = extract_pdf_text(pdf)
    assert "Hello world" in text
    assert "test document" in text


def test_pdf_multi_page_form_feeds():
    pdf = pdfgen.make_pdf(["Page one text here.", "Page two text here.", "Page three."])
    text = extract_pdf_text(pdf)
    pages = text.split("\f")
    assert len(pages) == 3
    assert "Page one" in pages[0]
    assert "Page two" in pages[1]
    assert "Page three" in pages[2]


def test_pdf_compressed_streams():
    pdf = pdfgen.make_pdf(["Compressed content stream page."], compress=True)
    text = extract_pdf_text(pdf)
    assert "Compressed content stream page" in text


def test_pdf_escapes_in_literals():
    pdf = pdfgen.make_pdf(["Parens (nested) and back\\slash."])
    text = extract_pdf_text(pdf)
    assert "(nested)" in text
    assert "back\\slash" in text


def test_pdf_garbage_raises():
    with pytest.raises(PdfExtractionError):
        extract_pdf_text(b"not a pdf at all")


def test_pdf_to_chunks_end_to_end():
    body1 = "INTRODUCTION\n\n" + "This is sentence number one. " * 3
    body2 = "Second page content sentence. " * 3
    pdf = pdfgen.make_pdf([body1, body2])
    text = extract_pdf_text(pdf)
    frags = chunk_text(text, chunk_tokens=200)
    assert frags
    pages = {f.page_number for f in frags}
    assert 1 in pages
