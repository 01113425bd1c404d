"""Template-engine component tests in the reference's fixture style:
hand-positioned synthetic tokens with known expected structured output
(modeled on /root/reference/tests/test_invoice_rule_extractor.py — the
fixture *style*, with our own documents and assertions)."""

from doc_ocr_spark.core.builtin_templates import builtin_templates
from doc_ocr_spark.core.extractor import extract_document, _parse_pdftok
from doc_ocr_spark.core.layout import cluster_lines
from doc_ocr_spark.core.templates import (
    build_column_boundaries,
    detect_header,
    extract_table,
    match_template,
)
from doc_ocr_spark.core.tokens import Token
from doc_ocr_spark.datagen import _invoice_en_doc, _pdftok_bytes, _rng
import json


def T(text, x1, y, x2=None, page=1):
    return Token(text, x1, y, x2 if x2 is not None else x1 + 7 * len(text), y + 12, page)


TABLE_SPEC = {
    "header": ["Item", "Qty", "Amount"],
    "header_match": {"min_hit": 3, "max_x_gap": 10.0},
    "column_map": {"Item": "item", "Qty": "qty", "Amount": "amount"},
    "first_column_left": 0.0,
    "assign_rule": {"x_tol": 2.0},
    "row_group": {"mode": "line", "blank": "ignore_blank"},
    "required_fields": ["item", "amount"],
    "sum_row": {"key": "TOTAL", "fields": ["amount"], "required": True},
}


def _table_lines(rows):
    toks = [T("Item", 40, 0), T("Qty", 300, 0), T("Amount", 470, 0)]
    y = 30
    for r in rows:
        for text, x in r:
            toks.append(T(text, x, y))
        y += 25
    return cluster_lines(toks, y_tol=5.0)


def test_header_detect_split_tokens():
    # header label 'Amount' split across adjacent tokens -> shortest-span
    # cursor match (L13)
    toks = [T("Item", 40, 0), T("Qty", 300, 0), T("Amo", 470, 0, 491), T("unt", 493, 0)]
    lines = cluster_lines(toks, y_tol=5.0)
    hm = detect_header(lines, TABLE_SPEC)
    assert hm is not None
    assert set(hm.spans) == {"Item", "Qty", "Amount"}
    assert hm.spans["Amount"] == (470, 493 + 21)


def test_header_min_hit_gate():
    toks = [T("Item", 40, 0), T("Other", 300, 0)]
    assert detect_header(cluster_lines(toks, 5.0), TABLE_SPEC) is None


def test_column_boundaries_midpoints_and_widen():
    lines = _table_lines([])
    hm = detect_header(lines, TABLE_SPEC)
    cols = build_column_boundaries(hm, TABLE_SPEC)
    labels = [c[0] for c in cols]
    assert labels == ["Item", "Qty", "Amount"]
    item, qty, amount = cols
    # first_column_left=0 minus x_tol
    assert item[1] == -2.0
    # boundary between item and qty is midpoint of centers +- x_tol
    assert qty[1] < 300 < qty[2]
    assert amount[2] == float("inf")


def test_table_line_mode_rows_and_sum():
    lines = _table_lines(
        [
            [("apple pie", 40), ("2", 300), ("10.00", 470)],
            [("banana", 40), ("1", 300), ("5.50", 470)],
            [("TOTAL", 40), ("15.50", 470)],
        ]
    )
    tr = extract_table(lines, TABLE_SPEC)
    assert tr.errors == []
    assert [r["item"] for r in tr.rows] == ["apple pie", "banana"]
    assert tr.sums == {"total_amount": 15.5, "amount_with_tax": 15.5}


def test_table_missing_sum_is_error_not_exception():
    lines = _table_lines([[("apple", 40), ("10.00", 470)]])
    tr = extract_table(lines, TABLE_SPEC)
    assert "sum_row_not_found" in tr.errors
    assert len(tr.rows) == 1


def test_table_required_fields_filter():
    lines = _table_lines(
        [
            [("apple", 40), ("10.00", 470)],
            [("2", 300)],  # qty-only line -> dropped (no item/amount)
            [("TOTAL", 40), ("10.00", 470)],
        ]
    )
    tr = extract_table(lines, TABLE_SPEC)
    assert [r["item"] for r in tr.rows] == ["apple"]


def test_anchor_mode_block_merge():
    spec = dict(TABLE_SPEC)
    spec["row_group"] = {
        "mode": "anchor",
        "anchor_required": ["amount"],
        "anchor_any": ["item"],
        "merge_join": ["item"],
        "joiner": " ",
        "blank": "ignore_blank",
    }
    lines = _table_lines(
        [
            [("apple", 40), ("2", 300), ("10.00", 470)],
            [("continued desc", 40)],  # continuation: item text only
            [("banana", 40), ("1", 300), ("5.50", 470)],
            [("TOTAL", 40), ("15.50", 470)],
        ]
    )
    tr = extract_table(lines, spec)
    assert [r["item"] for r in tr.rows] == ["apple continued desc", "banana"]
    assert tr.rows[0]["amount"] == "10.00"


def test_anchor_mode_first_row_fallback():
    spec = dict(TABLE_SPEC)
    spec["row_group"] = {
        "mode": "anchor",
        "anchor_required": ["amount"],
        "anchor_any": ["item"],
        "merge_join": ["item"],
        "joiner": " ",
        "blank": "ignore_blank",
    }
    # first line has amount but no item -> promoted to anchor; item follows
    lines = _table_lines(
        [
            [("2", 300), ("10.00", 470)],
            [("late item name", 40)],
            [("TOTAL", 40), ("10.00", 470)],
        ]
    )
    tr = extract_table(lines, spec)
    assert tr.rows == [{"qty": "2", "amount": "10.00", "item": "late item name"}]


def _anchor_spec(**extra):
    spec = dict(TABLE_SPEC)
    spec["row_group"] = {
        "mode": "anchor",
        "anchor_required": ["amount"],
        "anchor_any": ["item"],
        "merge_join": ["item"],
        "joiner": " ",
        "blank": "ignore_blank",
        **extra,
    }
    return spec


def test_anchor_skip_before_sum_folds_last_line():
    """L16 anchor_skip_before_sum (invoice_rule_extractor.py:365,481):
    an anchor-shaped line whose next effective line is the sum row is a
    wrapped continuation, not a new item row."""
    rows = [
        [("apple", 40), ("2", 300), ("10.00", 470)],
        [("wrapped desc", 40), ("10.00", 470)],  # anchor-shaped, pre-sum
        [("TOTAL", 40), ("10.00", 470)],
    ]
    folded = extract_table(_table_lines(rows), _anchor_spec(anchor_skip_before_sum=True))
    assert [r["item"] for r in folded.rows] == ["apple wrapped desc"]
    assert folded.rows[0]["amount"] == "10.00"
    # default (flag off) keeps round-1 behavior: spurious second row
    split = extract_table(_table_lines(rows), _anchor_spec())
    assert [r["item"] for r in split.rows] == ["apple", "wrapped desc"]


def test_anchor_skip_before_sum_folds_full_pre_sum_anchor_too():
    """Reference-faithful edge (invoice_rule_extractor.py:479-500 has no
    'is it a fragment?' guard): ANY anchor whose next effective line is
    the sum row folds — including a legitimate one-line item row.  This
    is why the one-line-row en template keeps the flag off."""
    rows = [
        [("apple", 40), ("2", 300), ("10.00", 470)],
        [("banana", 40), ("1", 300), ("5.50", 470)],
        [("TOTAL", 40), ("15.50", 470)],
    ]
    tr = extract_table(_table_lines(rows), _anchor_spec(anchor_skip_before_sum=True))
    assert [r["item"] for r in tr.rows] == ["apple banana"]


def test_anchor_skip_before_sum_name_anchored_reference_shape():
    """The flag's native domain (reference e-invoice layout): name lines
    anchor, numbers lines continue, and only a wrapped name tail right
    before the sum row folds — mid-table blocks stay separate."""
    spec = _anchor_spec(anchor_skip_before_sum=True)
    spec["row_group"]["anchor_required"] = ["item"]
    spec["row_group"]["anchor_any"] = []
    rows = [
        [("apple pie", 40)],
        [("2", 300), ("10.00", 470)],
        [("banana split", 40)],
        [("1", 300), ("5.50", 470)],
        [("deluxe", 40)],  # wrapped name tail, anchor-shaped, pre-sum
        [("TOTAL", 40), ("15.50", 470)],
    ]
    tr = extract_table(_table_lines(rows), spec)
    assert [r["item"] for r in tr.rows] == ["apple pie", "banana split deluxe"]
    assert tr.rows[1]["amount"] == "5.50"


def test_anchor_skip_before_sum_looks_past_blanks():
    """ignore_blank lets the lookahead skip blank lines between the
    would-be anchor and the sum row (reference :781-785)."""
    rows = [
        [("apple", 40), ("2", 300), ("10.00", 470)],
        [("wrapped desc", 40), ("10.00", 470)],
        [("  ", 40)],  # blank line (whitespace-only cells)
        [("TOTAL", 40), ("10.00", 470)],
    ]
    tr = extract_table(_table_lines(rows), _anchor_spec(anchor_skip_before_sum=True))
    assert [r["item"] for r in tr.rows] == ["apple wrapped desc"]


def test_sum_neighbor_search_down():
    spec = dict(TABLE_SPEC)
    spec["sum_row"] = {
        "key": "TOTAL",
        "fields": ["amount"],
        "required": True,
        "neighbor_search": {"max_lines_down": 2, "max_lines_up": 0},
    }
    # sum label line carries no amount; value sits one line below
    lines = _table_lines(
        [
            [("apple", 40), ("10.00", 470)],
            [("TOTAL", 40)],
            [("10.00", 470)],
        ]
    )
    tr = extract_table(lines, spec)
    assert tr.sums["total_amount"] == 10.0


def test_stop_anchor_halts_table():
    spec = dict(TABLE_SPEC)
    spec["row_end"] = {"stop_anchors": ["Issued by"]}
    spec["sum_row"] = {"key": "TOTAL", "fields": ["amount"], "required": False}
    lines = _table_lines(
        [
            [("apple", 40), ("10.00", 470)],
            [("Issued by clerk", 40)],
            [("ghost row", 40), ("99.99", 470)],
        ]
    )
    tr = extract_table(lines, spec)
    assert [r["item"] for r in tr.rows] == ["apple"]


def test_match_template_required_anchor_veto():
    templates = builtin_templates()
    r = _rng(42, 7)
    toks = [
        Token(**{k: v for k, v in t.items()})
        for t in _invoice_en_doc(r, 7)
    ]
    m = match_template(toks, templates)
    assert m is not None and m.template["name"] == "invoice_en"
    # remove the required 'Invoice No' anchor -> no match
    toks2 = [t for t in toks if "Invoice No" not in t.text]
    assert match_template(toks2, templates) is None


def test_match_template_argmax_prefers_higher_score():
    # zh doc must dispatch to invoice_zh even though invoice_en is listed first
    from doc_ocr_spark.datagen import _invoice_zh_doc

    r = _rng(42, 3)
    toks = [Token(**t) for t in _invoice_zh_doc(r, 3)]
    m = match_template(toks, builtin_templates())
    assert m is not None and m.template["name"] == "invoice_zh"


def test_end_to_end_envelope_complete():
    r = _rng(42, 11)
    payload = _pdftok_bytes(_invoice_en_doc(r, 11))
    res = extract_document("u", payload)
    assert res.complete and res.errors == []
    fields = json.loads(res.fields_json)
    assert fields["invoice_no"] == "INV-000011"
    assert fields["total_amount"] == sum(i["amount"] for i in fields["items"])


class TestZhSpecialTemplate:
    """Third builtin template (the reference ships three: general /
    special / special-property — einvoice_vat_special_property.json
    differs by title part, one extra required score-3 anchor, and
    cert/area table headers).  Dispatch semantics under test: required-
    anchor rejection and min_score."""

    def _special_doc(self, seq=7):
        import random

        from doc_ocr_spark.datagen import _invoice_zh_special_doc, _pdftok_bytes

        return _pdftok_bytes(_invoice_zh_special_doc(random.Random(5), seq))

    def _general_doc(self, seq=7):
        import random

        from doc_ocr_spark.datagen import _invoice_zh_doc, _pdftok_bytes

        return _pdftok_bytes(_invoice_zh_doc(random.Random(5), seq))

    def test_special_doc_dispatches_to_special_template(self):
        import json

        from doc_ocr_spark.core.extractor import extract_document

        res = extract_document("u", self._special_doc(), None)
        assert res.template_name == "invoice_zh_special"
        assert res.complete, res.errors
        d = json.loads(res.fields_json)
        assert d["kind"] == "property"
        assert d["items"][0]["cert_no"].startswith("证")
        assert isinstance(d["items"][0]["area"], float)
        assert d["total_amount"] == sum(i["amount"] for i in d["items"])

    def test_general_doc_rejected_by_special_required_anchor(self):
        from doc_ocr_spark.core.builtin_templates import INVOICE_ZH_SPECIAL
        from doc_ocr_spark.core.extractor import extract_document

        # only the special template offered: the general zh doc has no
        # 产权证号 anchor -> required-anchor miss -> no match
        res = extract_document("u", self._general_doc(), [INVOICE_ZH_SPECIAL])
        assert res.template_name is None
        assert "template_not_matched" in res.errors

    def test_special_doc_rejected_by_general_min_score(self):
        from doc_ocr_spark.core.builtin_templates import INVOICE_ZH
        from doc_ocr_spark.core.extractor import extract_document

        # only the general template offered: special title lacks the
        # 普通发票 part -> score stays below min_score -> no match
        res = extract_document("u", self._special_doc(), [INVOICE_ZH])
        assert res.template_name is None
        assert "template_not_matched" in res.errors

    def test_general_doc_keeps_general_template_with_full_set(self):
        from doc_ocr_spark.core.extractor import extract_document

        res = extract_document("u", self._general_doc(), None)
        assert res.template_name == "invoice_zh"

    def test_special_doc_wins_over_general_when_both_offered(self):
        from doc_ocr_spark.core.builtin_templates import (
            INVOICE_ZH,
            INVOICE_ZH_SPECIAL,
        )
        from doc_ocr_spark.core.extractor import extract_document

        res = extract_document(
            "u", self._special_doc(), [INVOICE_ZH, INVOICE_ZH_SPECIAL]
        )
        assert res.template_name == "invoice_zh_special"
