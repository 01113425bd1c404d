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
        ("rotated", True, ()),
        ("rotated180", True, ()),
        ("rotated270", True, ()),
        ("multipage", True, ()),
        ("empty", False, ("empty_document",)),
        ("multicolumn", False, ("template_not_matched",)),
        ("summissing", False, ("sum_row_not_found", "missing_required:total_amount")),
        ("lastrowfold", True, ()),
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


def test_lastrowfold_wrapped_tail_folds_not_splits():
    """L16 anchor_skip_before_sum end-to-end: the wrapped name tail
    before 合计 merges into the last item (its text ends with the tail)
    instead of becoming a spurious extra row, and the item count equals
    the number of amounts (one per real row)."""
    import json

    seen = 0
    for fam, page, res in _results():
        if fam != "lastrowfold":
            continue
        seen += 1
        assert res.complete, (page["url"], res.errors)
        items = json.loads(res.fields_json)["items"]
        # every item has a real amount; the tail contributed no row
        amounts = [i["amount"] for i in items]
        assert all(a is not None for a in amounts)
        # the folded tail makes the last item name longer than the
        # *cat*name pattern alone (two zh words = 2 chars each + 2 stars)
        assert len(items[-1]["item"]) > 6, items[-1]
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


def test_rotated_recovers_same_fields_as_upright():
    """A 90-degree-rotated invoice must extract the same structured
    fields as its upright twin (orientation normalization P1/P2)."""
    import json as _json

    from doc_ocr_spark.core.extractor import _parse_pdftok
    from doc_ocr_spark.datagen import _invoice_en_doc, _pdftok_bytes, _rotate_cw, _rng

    r1, r2 = _rng(42, 9), _rng(42, 9)
    upright = _pdftok_bytes(_invoice_en_doc(r1, 9))
    rotated = _pdftok_bytes(_rotate_cw(_invoice_en_doc(r2, 9)))
    a = extract_document("u", upright)
    b = extract_document("u", rotated)
    assert a.complete and b.complete
    assert a.fields_json == b.fields_json


def test_rotated_180_and_270_extract_byte_identically_to_upright():
    """The full {0,90,180,270} label set (reference preprocess.py:
    127-139): every rotation of an invoice extracts BYTE-identically
    (text, spans, fields, errors) to its upright twin."""
    from doc_ocr_spark.datagen import _invoice_en_doc, _pdftok_bytes, _rotate_cw, _rng

    for seq in (3, 9, 17, 25):
        up_toks = _invoice_en_doc(_rng(42, seq), seq)
        a = extract_document("u", _pdftok_bytes(up_toks))
        toks = up_toks
        for nrot in (1, 2, 3):
            toks = _rotate_cw(toks)
            b = extract_document("u", _pdftok_bytes(toks))
            assert (
                a.extracted_text == b.extracted_text
                and a.spans == b.spans
                and a.fields_json == b.fields_json
                and a.errors == b.errors
            ), (seq, nrot * 90)


def test_rotation_detector_is_a_noop_on_upright_pages():
    """No upright family may be misread as rotated — including the
    column layouts that break variance-based flush-left cues."""
    from doc_ocr_spark.core.layout import detect_rotation
    from doc_ocr_spark.core.extractor import _parse_pdftok

    for fam, page, res in _results():
        if fam in ("rotated", "rotated180", "rotated270", "empty") or not page[
            "html"
        ].startswith(b"PDFTOK\n"):
            continue
        toks = [t for t in _parse_pdftok(page["html"]) if t.page == 1]
        assert detect_rotation(toks) == 0, page["url"]


def test_multipage_invoice_page1_fields_page2_text():
    import json as _json

    for fam, page, res in _results():
        if fam != "multipage":
            continue
        assert res.template_name == "invoice_en"
        fields = _json.loads(res.fields_json)
        assert "Terms" not in fields.get("buyer", {}).get("name", "")
        assert "Terms:" in res.extracted_text  # page 2 kept in reading order


def test_determinism_same_input_same_output():
    p = PAGES[0]
    a = extract_document(p["url"], p["html"])
    b = extract_document(p["url"], p["html"])
    assert a == b
