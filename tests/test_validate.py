from doc_ocr_spark.core.validate import get_path, set_path, validate_payload


def test_dotted_paths():
    d = {}
    set_path(d, "buyer.tax_id", "X1")
    assert d == {"buyer": {"tax_id": "X1"}}
    assert get_path(d, "buyer.tax_id") == "X1"
    assert get_path(d, "buyer.missing") is None


def test_coercions():
    fields = {
        "amount": {"type": "number"},
        "count": {"type": "integer"},
        "when": {"type": "date"},
        "ok": {"type": "boolean"},
    }
    data, errors = validate_payload(
        {"amount": "$1,234.50", "count": "7", "when": "2024年1月5日", "ok": "yes"},
        fields,
    )
    assert errors == []
    assert data == {"amount": 1234.5, "count": 7, "when": "2024-01-05", "ok": True}


def test_missing_required_error_string():
    data, errors = validate_payload({}, {"x": {"type": "string", "required": True}})
    assert errors == ["missing_required:x"]


def test_invalid_type_error_string():
    data, errors = validate_payload(
        {"n": "junk"}, {"n": {"type": "number", "required": True}}
    )
    assert errors == ["invalid_type:n"]


def test_constraints():
    _, errors = validate_payload(
        {"code": "abc"}, {"code": {"type": "string", "regex": "^[A-Z]+$"}}
    )
    assert errors == ["constraint:code"]
    _, errors = validate_payload({"v": "5"}, {"v": {"type": "number", "min": 10}})
    assert errors == ["constraint:v"]


def test_array_invalid_optional_dropped_required_errors():
    fields = {
        "items": {
            "type": "array",
            "items": {
                "type": "object",
                "properties": {
                    "name": {"type": "string", "required": True},
                    "qty": {"type": "integer"},  # optional
                },
            },
        }
    }
    # invalid optional qty silently dropped; item kept
    data, errors = validate_payload(
        {"items": [{"name": "a", "qty": "junk"}]}, fields
    )
    assert errors == []
    assert data == {"items": [{"name": "a"}]}
    # missing required name errors
    data, errors = validate_payload({"items": [{"qty": "3"}]}, fields)
    assert errors == ["missing_required:items[0].name"]


def test_nested_object():
    fields = {
        "buyer": {
            "type": "object",
            "required": True,
            "properties": {"name": {"type": "string", "required": True}},
        }
    }
    data, errors = validate_payload({"buyer": {"name": "Acme"}}, fields)
    assert errors == [] and data == {"buyer": {"name": "Acme"}}
    data, errors = validate_payload({"buyer": {}}, fields)
    assert errors == ["missing_required:buyer"]
