from doc_ocr_spark.core.boilerplate import classify_blocks, extract_main_content
from doc_ocr_spark.core.htmltok import tokenize_html

_PAGE = (
    '<nav><a href="/a">home</a> <a href="/b">about</a> <a href="/c">shop</a></nav>'
    "<article><h1>The Quiet Valley</h1>"
    "<p>The river ran slowly through the quiet valley carrying silt from the "
    "high meadows down toward the distant sea every single day.</p>"
    "<p>Farmers along the banks planted wheat and barley in the dark soil "
    "watching the clouds for any early sign of the autumn rains.</p></article>"
    '<footer><a href="/t">terms</a> <a href="/p">privacy</a> <a href="/c">cookies</a></footer>'
)


def test_chrome_dropped_content_kept():
    blocks = tokenize_html(_PAGE)
    keep = classify_blocks(blocks)
    kept = [b.text for b, k in zip(blocks, keep) if k]
    assert any("river ran slowly" in t for t in kept)
    assert all("home" not in t for t in kept)
    assert all("privacy" not in t for t in kept)


def test_heading_rescued_before_content():
    blocks = tokenize_html(_PAGE)
    keep = classify_blocks(blocks)
    kept = [b.text for b, k in zip(blocks, keep) if k]
    assert "The Quiet Valley" in kept


def test_link_farm_dropped_even_outside_chrome():
    html = (
        '<div><a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a> '
        '<a href="/4">four</a></div>'
        "<p>Actual prose with plenty of ordinary words keeps flowing here well "
        "past the forty word threshold that applies after a dense link block "
        "because the classifier becomes stricter when the previous block looks "
        "like navigation so this sentence simply continues until it is clearly "
        "long enough to count as body text.</p>"
    )
    blocks = tokenize_html(html)
    keep = classify_blocks(blocks)
    assert keep[1] is True
    assert keep[0] is False  # link density 1.0


def test_spans_offsets_are_exact():
    asm = extract_main_content(tokenize_html(_PAGE))
    for field, start, end in asm.spans:
        assert asm.text[start:end] == asm.text[start:end].strip()
        assert len(asm.text[start:end]) == end - start
    # spans tile the text with single-newline separators
    rebuilt = "\n".join(asm.text[s:e] for _, s, e in asm.spans)
    assert rebuilt == asm.text
