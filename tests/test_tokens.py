from doc_ocr_spark.core.tokens import (
    fullwidth_to_halfwidth,
    is_empty,
    normalize_text,
    parse_boolean,
    parse_date,
    parse_integer,
    parse_number,
    strip_anchor_tail,
)


def test_fullwidth_to_halfwidth():
    assert fullwidth_to_halfwidth("ＡＢＣ１２３") == "ABC123"
    assert fullwidth_to_halfwidth("　") == " "


def test_normalize_order_matters():
    # fullwidth colon becomes ':' first, brackets stripped, ws removed, lower
    assert normalize_text("（Ａ Ｂ）：X") == "ab:x"


def test_parse_number_strip_and_reject():
    assert parse_number("CNY 1,000.50") == 1000.50
    assert parse_number("$-12.5") == -12.5
    assert parse_number("¥460.54") == 460.54
    assert parse_number("junk") is None
    assert parse_number("-.") is None
    assert parse_number("") is None
    assert parse_number(None) is None
    assert parse_number(3) == 3.0


def test_parse_integer_boolean():
    assert parse_integer("8 pcs") == 8
    assert parse_boolean("Yes") is True
    assert parse_boolean("0") is False
    assert parse_boolean("maybe") is None


def test_parse_date_formats():
    assert parse_date("2025-3-7") == "2025-03-07"
    assert parse_date("2025/03/07") == "2025-03-07"
    assert parse_date("2025年3月7日") == "2025-03-07"
    assert parse_date("2025年13月7日") is None
    assert parse_date("no date") is None


def test_strip_anchor_tail():
    assert strip_anchor_tail("： value") == "value"
    assert strip_anchor_tail(": v") == "v"
    assert strip_anchor_tail("v") == "v"


def test_is_empty():
    assert is_empty(None) and is_empty(" ") and is_empty([]) and is_empty({})
    assert not is_empty(0) and not is_empty("x")
