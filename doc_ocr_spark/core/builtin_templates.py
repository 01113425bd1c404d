"""Built-in extraction templates for the synthetic corpus families.

Our own template set, written in the DSL of templates.py (same clause
semantics as the reference's app/invoice_templates/*.json — title parts,
scored anchors, anchor fields with right-neighbour geometry, table spec
with sum row — but NOT a copy of those files; the documents they match
are the deterministic synthetic PDF-like payloads from datagen.py).

Like the reference's loader (template_loader.py:14-33): templates are
returned in a deterministic priority order and key-checked on load.
"""

from __future__ import annotations

from doc_ocr_spark.core.templates import check_template

INVOICE_EN = {
    "name": "invoice_en",
    "match_rules": {
        "title": {"parts": ["TAX", "INVOICE"], "score": 2.0, "y_tol": 6.0},
        "anchors": [
            {"text": "Invoice No", "score": 2.0, "required": True},
            {"text": "TOTAL", "score": 1.0},
        ],
        "min_score": 4.0,
    },
    "fixed_fields": {"currency": "USD"},
    "non_table_fields": [
        {
            "name": "invoice_no",
            "use": "text",
            "regex": r"Invoice\s*No[.:：]?\s*([A-Z]+-\d+)",
        },
        {
            "name": "issue_date",
            "use": "text",
            "regex": r"Date[.:：]?\s*(\d{4}-\d{1,2}-\d{1,2})",
        },
        {
            "name": "buyer.name",
            "use": "text",
            "anchor": "Buyer",
            "x_gap": [0.0, 120.0],
            "y_tol": 6.0,
        },
        {
            "name": "seller.name",
            "use": "text",
            "anchor": "Seller",
            "x_gap": [0.0, 120.0],
            "y_tol": 6.0,
        },
    ],
    "table": {
        "header": ["Item", "Qty", "Price", "Amount"],
        "header_match": {"min_hit": 3, "max_x_gap": 10.0},
        "column_map": {
            "Item": "item",
            "Qty": "qty",
            "Price": "price",
            "Amount": "amount",
        },
        "first_column_left": 0.0,
        "assign_rule": {"x_tol": 2.0},
        "row_group": {
            "mode": "anchor",
            "anchor_required": ["amount"],
            "anchor_any": ["item"],
            # anchor_skip_before_sum deliberately OFF here: this layout
            # puts a full item row on ONE line abutting TOTAL, so the
            # reference's pre-sum fold (built for split name/number
            # e-invoice lines) would swallow every legitimate last row.
            # The zh templates below enable it, like the reference's 3.
            "merge_join": ["item"],
            "joiner": " ",
            "blank": "ignore_blank",
            "y_gap": 1.0,
        },
        "row_end": {"stop_anchors": ["Issued by", "Thank you"]},
        "required_fields": ["item", "amount"],
        "sum_row": {
            "key": "TOTAL",
            "fields": ["amount"],
            "required": True,
            "neighbor_search": {
                "max_lines_down": 2,
                "max_lines_up": 1,
                "stop_anchor": "Issued by",
            },
        },
    },
    "fields": {
        "invoice_no": {"type": "string", "required": True, "regex": r"^[A-Z0-9\-]+$"},
        "issue_date": {"type": "date", "required": True},
        "currency": {"type": "string"},
        "buyer": {
            "type": "object",
            "properties": {"name": {"type": "string", "required": True}},
            "required": True,
        },
        "seller": {
            "type": "object",
            "properties": {"name": {"type": "string"}},
        },
        "items": {
            "type": "array",
            "required": True,
            "min_len": 1,
            "items": {
                "type": "object",
                "properties": {
                    "item": {"type": "string", "required": True},
                    "qty": {"type": "integer"},
                    "price": {"type": "number"},
                    "amount": {"type": "number", "required": True},
                },
            },
        },
        "total_amount": {"type": "number", "required": True},
        "tax_amount": {"type": "number"},
        "amount_with_tax": {"type": "number"},
    },
}

INVOICE_ZH = {
    "name": "invoice_zh",
    "match_rules": {
        "title": {"parts": ["电子发票", "普通发票"], "score": 2.0, "y_tol": 6.0},
        "anchors": [
            {"text": "发票号码", "score": 2.0, "required": True},
            {"text": "合计", "score": 1.0},
        ],
        "min_score": 4.0,
    },
    "fixed_fields": {"currency": "CNY"},
    "non_table_fields": [
        {
            "name": "invoice_no",
            "use": "both",
            "anchor": "发票号码",
            "x_gap": [0.0, 120.0],
            "y_tol": 6.0,
        },
        {
            "name": "issue_date",
            "use": "text",
            "regex": r"开票日期[:：]?\s*(\d{4}年\d{1,2}月\d{1,2}日)",
        },
        {
            "name": "buyer.name",
            "use": "pos",
            "region": [0.0, 0.22, 0.5, 0.50],
            "regex": r"名称[:：]?(.+)",
        },
        {
            "name": "seller.name",
            "use": "pos",
            "region": [0.5, 0.22, 1.0, 0.50],
            "regex": r"名称[:：]?(.+)",
        },
    ],
    "table": {
        "header": ["项目名称", "数量", "单价", "金额"],
        "header_match": {"min_hit": 3, "max_x_gap": 10.0},
        "column_map": {
            "项目名称": "item",
            "数量": "qty",
            "单价": "price",
            "金额": "amount",
        },
        "first_column_left": 0.0,
        "assign_rule": {"x_tol": 2.0},
        "row_group": {
            "mode": "anchor",
            # reference e-invoice row shape (invoice_rule_extractor.py
            # defaults + einvoice_*.json): the NAME line anchors a block,
            # the qty/price/amount line below is a continuation, and a
            # wrapped name fragment directly before the sum row folds
            # into the open block (anchor_skip_before_sum).
            "anchor_required": ["item"],
            "anchor_any": [],
            "anchor_skip_before_sum": True,
            "merge_join": ["item"],
            "joiner": "",
            "blank": "ignore_blank",
            "y_gap": 1.0,
        },
        "row_end": {"stop_anchors": ["开票人"]},
        "required_fields": ["item", "amount"],
        "sum_row": {
            "key": "合计",
            "fields": ["amount"],
            "required": True,
            "neighbor_search": {
                "max_lines_down": 2,
                "max_lines_up": 1,
                "stop_anchor": "开票人",
            },
        },
    },
    "fields": {
        "invoice_no": {"type": "string", "required": True},
        "issue_date": {"type": "date", "required": True},
        "currency": {"type": "string"},
        "buyer": {
            "type": "object",
            "properties": {"name": {"type": "string", "required": True}},
            "required": True,
        },
        "seller": {
            "type": "object",
            "properties": {"name": {"type": "string"}},
        },
        "items": {
            "type": "array",
            "required": True,
            "min_len": 1,
            "items": {
                "type": "object",
                "properties": {
                    "item": {"type": "string", "required": True},
                    "qty": {"type": "integer"},
                    "price": {"type": "number"},
                    "amount": {"type": "number", "required": True},
                },
            },
        },
        "total_amount": {"type": "number", "required": True},
        "amount_with_tax": {"type": "number"},
    },
}


# Property-special variant — the analogue of the reference's third
# template (einvoice_vat_special_property vs einvoice_general: same
# machinery, different title part, one extra REQUIRED high-score anchor,
# and table headers swapping unit-price columns for the property cert):
# demonstrates required-anchor rejection + min_score dispatch between
# competing templates.
INVOICE_ZH_SPECIAL = {
    "name": "invoice_zh_special",
    "match_rules": {
        "title": {"parts": ["电子发票", "专用发票"], "score": 2.0, "y_tol": 6.0},
        "anchors": [
            {"text": "发票号码", "score": 2.0, "required": True},
            {"text": "产权证号", "score": 3.0, "required": True},
            {"text": "合计", "score": 1.0},
        ],
        "min_score": 7.0,
    },
    "fixed_fields": {"currency": "CNY", "kind": "property"},
    "non_table_fields": [
        {
            "name": "invoice_no",
            "use": "both",
            "anchor": "发票号码",
            "x_gap": [0.0, 120.0],
            "y_tol": 6.0,
        },
        {
            "name": "issue_date",
            "use": "text",
            "regex": r"开票日期[:：]?\s*(\d{4}年\d{1,2}月\d{1,2}日)",
        },
        {
            "name": "buyer.name",
            "use": "pos",
            "region": [0.0, 0.22, 0.5, 0.50],
            "regex": r"名称[:：]?(.+)",
        },
        {
            "name": "seller.name",
            "use": "pos",
            "region": [0.5, 0.22, 1.0, 0.50],
            "regex": r"名称[:：]?(.+)",
        },
    ],
    "table": {
        "header": ["项目名称", "产权证号", "面积", "金额"],
        "header_match": {"min_hit": 3, "max_x_gap": 10.0},
        "column_map": {
            "项目名称": "item",
            "产权证号": "cert_no",
            "面积": "area",
            "金额": "amount",
        },
        "first_column_left": 0.0,
        "assign_rule": {"x_tol": 2.0},
        "row_group": {
            "mode": "anchor",
            # reference e-invoice row shape (invoice_rule_extractor.py
            # defaults + einvoice_*.json): the NAME line anchors a block,
            # the qty/price/amount line below is a continuation, and a
            # wrapped name fragment directly before the sum row folds
            # into the open block (anchor_skip_before_sum).
            "anchor_required": ["item"],
            "anchor_any": [],
            "anchor_skip_before_sum": True,
            "merge_join": ["item"],
            "joiner": "",
            "blank": "ignore_blank",
            "y_gap": 1.0,
        },
        "row_end": {"stop_anchors": ["开票人"]},
        "required_fields": ["item", "amount"],
        "sum_row": {
            "key": "合计",
            "fields": ["amount"],
            "required": True,
            "neighbor_search": {
                "max_lines_down": 2,
                "max_lines_up": 1,
                "stop_anchor": "开票人",
            },
        },
    },
    "fields": {
        "invoice_no": {"type": "string", "required": True},
        "issue_date": {"type": "date", "required": True},
        "currency": {"type": "string"},
        "kind": {"type": "string", "enum": ["property"]},
        "buyer": {
            "type": "object",
            "properties": {"name": {"type": "string", "required": True}},
            "required": True,
        },
        "seller": {
            "type": "object",
            "properties": {"name": {"type": "string"}},
        },
        "items": {
            "type": "array",
            "required": True,
            "min_len": 1,
            "items": {
                "type": "object",
                "properties": {
                    "item": {"type": "string", "required": True},
                    "cert_no": {"type": "string"},
                    "area": {"type": "number"},
                    "amount": {"type": "number", "required": True},
                },
            },
        },
        "total_amount": {"type": "number", "required": True},
        "amount_with_tax": {"type": "number"},
    },
}


def builtin_templates() -> list[dict]:
    """Deterministic priority order (name-sorted, like the reference's
    sorted glob)."""
    templates = sorted(
        [INVOICE_EN, INVOICE_ZH, INVOICE_ZH_SPECIAL], key=lambda t: t["name"]
    )
    for t in templates:
        check_template(t)
    return templates
