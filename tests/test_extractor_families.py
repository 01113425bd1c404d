"""Per-family expectations over the synthetic corpus (FIXTURES.md §2)."""

import pytest

from doc_ocr_spark.core.extractor import extract_document
from doc_ocr_spark.datagen import generate_pages

PAGES = generate_pages(440, seed=42)


def _family(url: str) -> str:
    return url.split("example-")[1].split(".test")[0]


def _results():
    for p in PAGES:
        yield _family(p["url"]), p, extract_document(p["url"], p["html"])


@pytest.mark.parametrize(
    "family,expect_complete,expect_errors",
    [
        ("article", True, ()),
        ("boilerplate", True, ()),
        ("giantblob", True, ()),
        ("splitanchor", True, ()),
        ("multilinerow", True, ()),
        ("nonlatin", True, ()),
        ("regionsplit", True, ()),
        ("firstrowanchor", True, ()),
        ("empty", False, ("empty_document",)),
        ("multicolumn", False, ("template_not_matched",)),
        ("summissing", False, ("sum_row_not_found", "missing_required:total_amount")),
    ],
)
def test_family_contract(family, expect_complete, expect_errors):
    seen = 0
    for fam, page, res in _results():
        if fam != family:
            continue
        seen += 1
        assert res.complete is expect_complete, (page["url"], res.errors)
        assert tuple(res.errors) == expect_errors, (page["url"], res.errors)
    assert seen > 0


def test_boilerplate_strips_chrome():
    for fam, page, res in _results():
        if fam != "boilerplate":
            continue
        assert "copyright" not in res.extracted_text
        assert "Related" not in res.extracted_text
        assert len(res.extracted_text) > 100


def test_multicolumn_reading_order_column_major():
    for fam, page, res in _results():
        if fam != "multicolumn":
            continue
        # left column tokens (x<300) must all precede right column tokens:
        # the extracted word sequence is exactly left-column words in (y,x)
        # order followed by right-column words in (y,x) order
        import json as _json

        toks = _json.loads(
            "[" + page["html"][7:].decode().replace("\n", ",") + "]"
        )
        left = sorted((t for t in toks if t["x1"] < 300), key=lambda t: (t["y1"], t["x1"]))
        right = sorted((t for t in toks if t["x1"] >= 300), key=lambda t: (t["y1"], t["x1"]))
        expected = [t["text"] for t in left] + [t["text"] for t in right]
        assert res.extracted_text.split() == expected


def test_determinism_same_input_same_output():
    p = PAGES[0]
    a = extract_document(p["url"], p["html"])
    b = extract_document(p["url"], p["html"])
    assert a == b
