"""Declarative payload validation + coercion (L24).

Re-expression of the reference's schema validator
(template_schema.py:17-164) with identical behavioural contract:

- value types: string, number, integer, boolean, date, object, array
- constraints: regex, enum, min, max, min_len, max_len
- dotted-path addressing (``buyer.tax_id``)
- error strings are DATA (``missing_required:path``,
  ``invalid_type:path``, ``constraint:path``) — exact format is part of
  golden byte-identity (SURVEY.md §7.4.4)
- invalid OPTIONAL properties inside array items are silently dropped;
  invalid REQUIRED ones error out (template_schema.py:101-106); arrays
  are re-emitted with only their valid items
"""

from __future__ import annotations

from typing import Any

from doc_ocr_spark.core.tokens import (
    is_empty,
    parse_boolean,
    parse_date,
    parse_integer,
    parse_number,
)


def get_path(data: dict, path: str) -> Any:
    """F9 — dotted-path get (template_schema.py:227-234)."""
    cur: Any = data
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def set_path(data: dict, path: str, value: Any) -> None:
    """F9 — dotted-path set, creating intermediate dicts."""
    parts = path.split(".")
    cur = data
    for part in parts[:-1]:
        nxt = cur.get(part)
        if not isinstance(nxt, dict):
            nxt = {}
            cur[part] = nxt
        cur = nxt
    cur[parts[-1]] = value


def _coerce(value: Any, ftype: str) -> tuple[Any, bool]:
    """-> (coerced, ok)."""
    if ftype == "string":
        return (str(value), True) if value is not None else (None, False)
    if ftype == "number":
        v = parse_number(value)
        return (v, v is not None)
    if ftype == "integer":
        v = parse_integer(value)
        return (v, v is not None)
    if ftype == "boolean":
        v = parse_boolean(value)
        return (v, v is not None)
    if ftype == "date":
        v = parse_date(value)
        return (v, v is not None)
    return (value, True)


def _check_constraints(value: Any, spec: dict) -> bool:
    import re as _re

    if "regex" in spec and not _re.search(spec["regex"], str(value)):
        return False
    if "enum" in spec and value not in spec["enum"]:
        return False
    if "min" in spec and not (isinstance(value, (int, float)) and value >= spec["min"]):
        return False
    if "max" in spec and not (isinstance(value, (int, float)) and value <= spec["max"]):
        return False
    if "min_len" in spec and len(str(value)) < spec["min_len"]:
        return False
    if "max_len" in spec and len(str(value)) > spec["max_len"]:
        return False
    return True


def _validate_value(
    value: Any, spec: dict, path: str, errors: list[str]
) -> tuple[Any, bool]:
    """-> (validated_value, ok). Appends error strings on failure."""
    ftype = spec.get("type", "string")
    if ftype == "object":
        if not isinstance(value, dict):
            errors.append(f"invalid_type:{path}")
            return (None, False)
        out: dict = {}
        ok = True
        for pname, pspec in spec.get("properties", {}).items():
            ppath = f"{path}.{pname}"
            pval = value.get(pname)
            if is_empty(pval):
                if pspec.get("required", False):
                    errors.append(f"missing_required:{ppath}")
                    ok = False
                continue
            vval, vok = _validate_value(pval, pspec, ppath, errors)
            if vok:
                out[pname] = vval
            else:
                ok = False
        return (out, ok)
    if ftype == "array":
        if not isinstance(value, list):
            errors.append(f"invalid_type:{path}")
            return (None, False)
        item_spec = spec.get("items", {"type": "string"})
        out_items = []
        for i, item in enumerate(value):
            if item_spec.get("type") == "object":
                # per-item: drop invalid optional props silently, error on
                # invalid required ones
                item_out: dict = {}
                item_ok = True
                for pname, pspec in item_spec.get("properties", {}).items():
                    ppath = f"{path}[{i}].{pname}"
                    pval = item.get(pname) if isinstance(item, dict) else None
                    if is_empty(pval):
                        if pspec.get("required", False):
                            errors.append(f"missing_required:{ppath}")
                            item_ok = False
                        continue
                    sub_errors: list[str] = []
                    vval, vok = _validate_value(pval, pspec, ppath, sub_errors)
                    if vok:
                        item_out[pname] = vval
                    elif pspec.get("required", False):
                        errors.extend(sub_errors)
                        item_ok = False
                    # invalid optional -> silently dropped
                if item_ok:
                    out_items.append(item_out)
            else:
                ipath = f"{path}[{i}]"
                sub_errors2: list[str] = []
                vval, vok = _validate_value(item, item_spec, ipath, sub_errors2)
                if vok:
                    out_items.append(vval)
        if is_empty(out_items) and spec.get("min_len"):
            errors.append(f"constraint:{path}")
            return (out_items, False)
        return (out_items, True)
    coerced, ok = _coerce(value, ftype)
    if not ok:
        errors.append(f"invalid_type:{path}")
        return (None, False)
    if not _check_constraints(coerced, spec):
        errors.append(f"constraint:{path}")
        return (None, False)
    return (coerced, True)


def validate_payload(payload: dict, fields: dict) -> tuple[dict, list[str]]:
    """L24 — validate/coerce ``payload`` against the template ``fields``
    schema; returns (clean_data, errors)."""
    errors: list[str] = []
    out: dict = {}
    for path, spec in fields.items():
        value = get_path(payload, path)
        if is_empty(value):
            if spec.get("required", False):
                errors.append(f"missing_required:{path}")
            continue
        vval, ok = _validate_value(value, spec, path, errors)
        if ok:
            set_path(out, path, vval)
    return (out, errors)
