from doc_ocr_spark.core.htmltok import decode_html, tokenize_html


def test_blocks_split_on_block_tags():
    blocks = tokenize_html("<p>one two</p><p>three</p>")
    assert [b.text for b in blocks] == ["one two", "three"]
    assert blocks[0].n_words == 2


def test_script_style_invisible():
    blocks = tokenize_html(
        "<p>keep</p><script>var drop=1;</script><style>.x{}</style><p>also</p>"
    )
    assert [b.text for b in blocks] == ["keep", "also"]


def test_link_words_counted():
    blocks = tokenize_html('<p>plain <a href="/x">linked words here</a> tail</p>')
    assert blocks[0].n_words == 5
    assert blocks[0].n_link_words == 3
    assert 0 < blocks[0].link_density < 1


def test_chrome_ancestry_flag():
    blocks = tokenize_html("<nav><p>menu</p></nav><p>content body text</p>")
    assert blocks[0].in_chrome is True
    assert blocks[1].in_chrome is False


def test_headings_flagged():
    blocks = tokenize_html("<h1>Title</h1><p>body</p>")
    assert blocks[0].is_heading and not blocks[1].is_heading


def test_entities_and_whitespace_collapse():
    blocks = tokenize_html("<p>a &amp;   b\n\tc</p>")
    assert blocks[0].text == "a & b c"


def test_malformed_html_tolerated():
    blocks = tokenize_html("<div><p>unclosed<div>next</p></div>")
    assert any("unclosed" in b.text for b in blocks)


def test_decode_replacement():
    assert "�" in decode_html(b"\xff\xfe broken")


def test_fast_scanner_equivalent_to_stdlib_parser():
    """The single-regex scanner must produce byte-identical blocks to
    the html.parser oracle over the whole synthetic corpus plus
    adversarial markup."""
    from doc_ocr_spark.core.htmltok import (
        decode_html,
        tokenize_html,
        tokenize_html_htmlparser,
    )
    from doc_ocr_spark.datagen import generate_pages

    for p in generate_pages(800, seed=7):
        h = decode_html(p["html"])
        assert tokenize_html(h) == tokenize_html_htmlparser(h), p["url"]

    cases = [
        '<div data-x="a>b">quoted gt</div>',
        "<P>UPPER</P><p title=it's>unquoted apostrophe</p>",
        '<p title=say"what>stray quote</p>',
        "<script>var a = '<div>nope</div>';</script><p>after cdata</p>",
        "<script>unterminated <p>swallowed",
        "<!-- comment --><p>x &amp; y &lt;3 &#65;</p>",
        "<br/><hr /><div/>self closed",
        "plain < not a tag > text",
        "<![CDATA[ <p>no</p> ]]><p>after</p>",
        "<?php echo '<p>no</p>'; ?><p>after pi</p>",
        "<nav><a href='/'>home</a></nav><main><p>body text</p></main>",
    ]
    for c in cases:
        assert tokenize_html(c) == tokenize_html_htmlparser(c), c
