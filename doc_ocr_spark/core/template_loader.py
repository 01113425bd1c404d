"""Template directory loader (S6 parity).

Mirrors the reference's loader semantics (template_loader.py:14-33):
JSON templates from a directory in sorted-glob order (deterministic
priority), required-key validation on load, cached per path (the
broadcast-variable analogue of its lru_cache(1)).
"""

from __future__ import annotations

import functools
import glob
import json
import os

from doc_ocr_spark.core.templates import check_template


@functools.lru_cache(maxsize=8)
def load_templates_dir(path: str) -> tuple[dict, ...]:
    """Sorted *.json from ``path``; ValueError on malformed templates."""
    templates = []
    for fp in sorted(glob.glob(os.path.join(path, "*.json"))):
        with open(fp, encoding="utf-8") as f:
            tpl = json.load(f)
        check_template(tpl)
        templates.append(tpl)
    return tuple(templates)


def resolve_templates(path: str | None = None) -> list[dict]:
    """Directory templates when given, else the built-ins."""
    if path:
        return list(load_templates_dir(path))
    from doc_ocr_spark.core.builtin_templates import builtin_templates

    return builtin_templates()
