"""Boilerplate classification: text-density / link-density block scoring.

The main-content analogue of the reference's table-line suppression stage
(preprocess.py:207-241 — "rule pixels must not influence content
detection"): navigation chrome, link farms and footers must not survive
into the extracted text.

The classifier is a deterministic re-implementation of the published
Boilerpipe ``NumWordsRulesClassifier`` decision list (Kohlschütter et al.,
WSDM 2010, public knowledge) extended with a chrome-ancestor veto and a
heading-rescue pass.  Input/output is pure data; no I/O.
"""

from __future__ import annotations

from dataclasses import dataclass

from doc_ocr_spark.core.htmltok import Block

# Boilerpipe's published thresholds (densitometric classifier)
_LINK_DENSITY_MAX = 0.333333
_PREV_LINK_DENSITY_MAX = 0.555556


def classify_blocks(blocks: list[Block]) -> list[bool]:
    """Return a keep/drop flag per block.

    Decision list per block b with neighbours p (prev) and n (next):

    - chrome ancestor (nav/header/footer/aside) -> boilerplate
    - link_density(b) > 1/3                     -> boilerplate
    - elif link_density(p) <= 0.556:
        content iff words(b) > 16 or words(n) > 15 or words(p) > 4
    - else:
        content iff words(b) > 40 or words(n) > 17

    followed by a heading-rescue pass: an h1-h6 block immediately before a
    kept block is kept (title lines are short and would otherwise fail the
    word-count gate — the analogue of the reference's title-line special
    casing, template_matcher.py:38-66).
    """
    n = len(blocks)
    keep = [False] * n
    for i, b in enumerate(blocks):
        if b.in_chrome:
            continue
        if b.link_density > _LINK_DENSITY_MAX:
            continue
        prev_b = blocks[i - 1] if i > 0 else None
        next_b = blocks[i + 1] if i + 1 < n else None
        prev_words = prev_b.n_words if prev_b is not None else 0
        next_words = next_b.n_words if next_b is not None else 0
        prev_ld = prev_b.link_density if prev_b is not None else 0.0
        if prev_ld <= _PREV_LINK_DENSITY_MAX:
            keep[i] = b.n_words > 16 or next_words > 15 or prev_words > 4
        else:
            keep[i] = b.n_words > 40 or next_words > 17
    # heading rescue (single forward-looking pass, right to left so chains
    # of headings above content are all rescued)
    for i in range(n - 2, -1, -1):
        if blocks[i].is_heading and not blocks[i].in_chrome and keep[i + 1]:
            keep[i] = True
    return keep


@dataclass
class Assembled:
    text: str
    # (field, start, end) char spans into ``text`` — one per kept block,
    # field = the block's tag (FIXTURES.md §4 spans column)
    spans: list[tuple[str, int, int]]


def assemble(blocks: list[Block], keep: list[bool]) -> Assembled:
    """Join kept blocks into the final extracted text with char spans.

    Separator is a single newline; offsets are Python str (code point)
    offsets.  This function defines the byte-identity surface — any change
    here invalidates golden sets.
    """
    parts: list[str] = []
    spans: list[tuple[str, int, int]] = []
    pos = 0
    for b, k in zip(blocks, keep):
        if not k:
            continue
        if parts:
            pos += 1  # the '\n' separator
        start = pos
        parts.append(b.text)
        pos += len(b.text)
        spans.append((b.tag, start, pos))
    return Assembled(text="\n".join(parts), spans=spans)


def extract_main_content(blocks: list[Block]) -> Assembled:
    return assemble(blocks, classify_blocks(blocks))
