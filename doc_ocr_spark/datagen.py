"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md).

Schema is exactly the `input_hint` shape: ``(url string, warc_ts
timestamp, html binary, text string, lang string)``.  Fixture families
(FIXTURES.md §2) mirror the reference's synthetic-positioned-token test
style (tests/test_invoice_rule_extractor.py:17-58) lifted to web pages:

  boilerplate-heavy  block scoring / link-density strip
  article            plain content page (bulk family)
  multi-column       column-order reconstruction
  non-latin          zh invoice (fullwidth, Chinese dates)
  split-anchor       anchor text split across adjacent tokens (L3/L13)
  multiline-row      anchor-block row grouping (L16-L17)
  sum-missing        failure taxonomy (incomplete rows kept as data)
  last-row-fold      zh invoice whose wrapped name tail abuts the sum
                     row (L16 anchor_skip_before_sum fold)
  rotated180/270     upside-down / counter-clockwise scans (P1/P2's
                     full {0,90,180,270} label set)
  region-split       left/right page-region field scoping (L6)
  first-row-anchor   required-only anchor fallback in L16
  empty              empty html guard
  giant-blob         skew: one html ~100x median size
  zh-special         property-special template variant (required extra
                     anchor, cert/area table columns — template dispatch)

Everything is seeded (no wall clock, no ambient randomness): same
(seed, n) -> byte-identical corpus, which is what makes the golden set
reproducible anywhere.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta, timezone

from doc_ocr_spark.core.extractor import PDFTOK_MAGIC

_BASE_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu ocean river mountain forest valley meadow "
    "harbor island plateau canyon glacier desert tundra savanna lagoon reef"
).split()

_ZH_WORDS = "办公 用品 服务 咨询 技术 开发 设计 培训 维护 租赁 材料 设备".split()

FAMILIES = (
    "boilerplate",
    "article",
    "multicolumn",
    "nonlatin",
    "splitanchor",
    "multilinerow",
    "summissing",
    "lastrowfold",
    "regionsplit",
    "firstrowanchor",
    "rotated",
    "rotated180",
    "rotated270",
    "multipage",
    "empty",
    "giantblob",
    "zhspecial",
)

# relative frequency per family (bulk families dominate, like a real crawl)
_WEIGHTS = {
    "boilerplate": 30,
    "article": 25,
    "multicolumn": 10,
    "nonlatin": 8,
    "splitanchor": 6,
    "multilinerow": 6,
    "summissing": 4,
    "lastrowfold": 3,
    "regionsplit": 4,
    "firstrowanchor": 3,
    "rotated": 3,
    "rotated180": 2,
    "rotated270": 2,
    "multipage": 3,
    "empty": 2,
    "giantblob": 2,
    "zhspecial": 4,
}
_FAMILY_WHEEL: list[str] = []
for fam in FAMILIES:
    _FAMILY_WHEEL.extend([fam] * _WEIGHTS[fam])


def _rng(seed: int, seq: int) -> random.Random:
    return random.Random((seed << 20) ^ seq)


def _sentence(r: random.Random, n: int) -> str:
    return " ".join(r.choice(_WORDS) for _ in range(n))


def _paragraph(r: random.Random) -> str:
    return ". ".join(
        _sentence(r, r.randint(8, 18)).capitalize() for _ in range(r.randint(2, 5))
    ) + "."


# ---------------------------------------------------------------------------
# HTML families


def _html_article(r: random.Random, *, heavy: bool, repeat: int = 1) -> tuple[str, str]:
    """-> (html, naive_text).  ``heavy`` adds nav/footer/ad chrome."""
    title = _sentence(r, r.randint(3, 6)).title()
    paras = [_paragraph(r) for _ in range(r.randint(3, 7) * repeat)]
    nav_links = " ".join(
        f'<a href="/{w}">{w}</a>' for w in r.sample(_WORDS, r.randint(6, 12))
    )
    related = "".join(
        f'<li><a href="/p/{i}">{_sentence(r, r.randint(2, 4))}</a></li>'
        for i in range(r.randint(4, 8))
    )
    chrome_top = (
        f"<nav>{nav_links}</nav><header><div>{_sentence(r, 4)}</div></header>"
        if heavy
        else ""
    )
    chrome_side = (
        f'<aside><h3>Related</h3><ul>{related}</ul></aside>' if heavy else ""
    )
    chrome_bottom = (
        f"<footer><div>{nav_links}</div><p>copyright {_sentence(r, 2)}</p></footer>"
        if heavy
        else ""
    )
    body_paras = "".join(f"<p>{p}</p>" for p in paras)
    html = (
        "<!DOCTYPE html><html><head><title>x</title>"
        "<script>var x=1;</script><style>.a{color:red}</style></head>"
        f"<body>{chrome_top}<article><h1>{title}</h1>{body_paras}</article>"
        f"{chrome_side}{chrome_bottom}</body></html>"
    )
    naive = title + " " + " ".join(paras)
    return html, naive


# ---------------------------------------------------------------------------
# PDFTOK families


def _tok(text: str, x1: float, y: float, *, page: int = 1, ch_w: float = 7.0, h: float = 12.0) -> dict:
    return {
        "text": text,
        "x1": x1,
        "y1": y,
        "x2": x1 + ch_w * max(1, len(text)),
        "y2": y + h,
        "page": page,
    }


def _pdftok_bytes(tokens: list[dict]) -> bytes:
    body = "\n".join(json.dumps(t, ensure_ascii=False, sort_keys=True) for t in tokens)
    return PDFTOK_MAGIC + body.encode("utf-8")


def _pdftok_text(tokens: list[dict]) -> str:
    return " ".join(t["text"] for t in tokens)


def _multicolumn_doc(r: random.Random) -> list[dict]:
    """Two newspaper columns; correct reading order is left column fully,
    then right."""
    toks: list[dict] = []
    for col, x0 in ((0, 40.0), (1, 340.0)):
        y = 40.0
        for _ in range(r.randint(8, 14)):
            words = _sentence(r, r.randint(3, 5)).split()
            x = x0
            for w in words:
                t = _tok(w, x, y, ch_w=6.0)
                # keep lines inside a 260px column
                if t["x2"] > x0 + 250:
                    break
                toks.append(t)
                x = t["x2"] + 10.0
            y += 18.0
    return toks


def _invoice_en_doc(
    r: random.Random,
    seq: int,
    *,
    split_title: bool = False,
    multiline: bool = False,
    omit_sum: bool = False,
    first_row_anchor: bool = False,
) -> list[dict]:
    toks: list[dict] = []
    # title
    if split_title:
        toks += [_tok("TAX", 220, 30), _tok("INV", 260, 30), _tok("OICE", 285, 30)]
    else:
        toks += [_tok("TAX", 220, 30), _tok("INVOICE", 260, 30)]
    toks.append(_tok(f"Invoice No: INV-{seq:06d}", 40, 70))
    toks.append(_tok(f"Date: 2025-{1 + seq % 12:02d}-{1 + seq % 28:02d}", 400, 70))
    toks.append(_tok("Buyer:", 40, 100))
    buyer = _sentence(r, 2).title() + " Ltd"
    toks.append(_tok(buyer, 95, 100))
    toks.append(_tok("Seller:", 330, 100))
    toks.append(_tok(_sentence(r, 2).title() + " Inc", 388, 100))
    # table header
    toks += [
        _tok("Item", 40, 150),
        _tok("Qty", 300, 150),
        _tok("Price", 380, 150),
        _tok("Amount", 470, 150),
    ]
    y = 180.0
    total = 0.0
    n_rows = r.randint(2, 4)
    for i in range(n_rows):
        qty = r.randint(1, 9)
        price = r.randint(100, 9999) / 100.0
        amount = round(qty * price, 2)
        total = round(total + amount, 2)
        item_words = _sentence(r, 3)
        if first_row_anchor and i == 0:
            # amount-only line first; item name follows on the next line
            toks += [
                _tok(str(qty), 300, y),
                _tok(f"{price:.2f}", 380, y),
                _tok(f"{amount:.2f}", 470, y),
            ]
            y += 22.0
            toks.append(_tok(item_words, 40, y))
        else:
            toks += [
                _tok(item_words, 40, y),
                _tok(str(qty), 300, y),
                _tok(f"{price:.2f}", 380, y),
                _tok(f"{amount:.2f}", 470, y),
            ]
            if multiline:
                y += 22.0
                toks.append(_tok(_sentence(r, 2), 40, y))
        y += 22.0
    if not omit_sum:
        if r.random() < 0.3:
            toks += [_tok("TOT", 40, y), _tok("AL", 64, y)]
        else:
            toks.append(_tok("TOTAL", 40, y))
        toks.append(_tok(f"{total:.2f}", 470, y))
        y += 22.0
    toks.append(_tok("Issued by robot clerk", 40, y + 10))
    return toks


def _rotate_cw(toks: list[dict]) -> list[dict]:
    """Rotate all token boxes 90 degrees clockwise — the 'scanned
    sideways' page the kernel's orientation heuristic must undo."""
    h = max(t["y2"] for t in toks)
    return [
        {
            "text": t["text"],
            "x1": h - t["y2"],
            "y1": t["x1"],
            "x2": h - t["y1"],
            "y2": t["x2"],
            "page": t["page"],
        }
        for t in toks
    ]


def _multipage_doc(r: random.Random, seq: int) -> list[dict]:
    """Invoice on page 1, free-text terms on page 2 (exercises the
    per-page grouping in L1/L5/L7 and the matched-page restriction)."""
    toks = _invoice_en_doc(r, seq)
    y = 40.0
    for _ in range(r.randint(3, 6)):
        toks.append(_tok("Terms: " + _sentence(r, r.randint(4, 8)), 40, y, page=2))
        y += 20.0
    return toks


def _invoice_zh_doc(
    r: random.Random,
    seq: int,
    *,
    region_split: bool = False,
    last_row_fold: bool = False,
) -> list[dict]:
    toks: list[dict] = []
    toks.append(_tok("电子发票（普通发票）", 200, 30, ch_w=14.0))
    toks.append(_tok("发票号码:", 40, 70, ch_w=12.0))
    toks.append(_tok(f"{25000000 + seq}", 110, 70))
    toks.append(_tok(f"开票日期:2025年{1 + seq % 12}月{1 + seq % 28}日", 340, 70, ch_w=12.0))
    buyer = "".join(r.choice(_ZH_WORDS) for _ in range(2)) + "有限公司"
    seller = "".join(r.choice(_ZH_WORDS) for _ in range(2)) + "集团"
    if region_split:
        toks.append(_tok(f"名称:{buyer}", 40, 110, ch_w=12.0))
        toks.append(_tok(f"名称:{seller}", 330, 110, ch_w=12.0))
    else:
        toks.append(_tok(f"购买方名称:{buyer}", 40, 110, ch_w=12.0))
        toks.append(_tok(f"销售方名称:{seller}", 330, 110, ch_w=12.0))
    toks += [
        _tok("项目名称", 40, 160, ch_w=12.0),
        _tok("数量", 300, 160, ch_w=12.0),
        _tok("单价", 380, 160, ch_w=12.0),
        _tok("金额", 470, 160, ch_w=12.0),
    ]
    y = 190.0
    total = 0.0
    n_rows = r.randint(1, 3)
    for i in range(n_rows):
        qty = r.randint(1, 9)
        price = r.randint(100, 9999) / 100.0
        amount = round(qty * price, 2)
        total = round(total + amount, 2)
        # reference e-invoice row shape (doc-ocr
        # tests/test_invoice_rule_extractor.py:95-102): the *cat*name
        # line anchors the block, the numbers line below continues it
        toks.append(
            _tok("*" + r.choice(_ZH_WORDS) + "*" + r.choice(_ZH_WORDS), 40, y, ch_w=12.0)
        )
        toks += [
            _tok(str(qty), 300, y + 14),
            _tok(f"{price:.2f}", 380, y + 14),
            _tok(f"{amount:.2f}", 470, y + 14),
        ]
        y += 36.0
        if last_row_fold and i == n_rows - 1:
            # wrapped name tail surfaces BELOW the numbers line (the
            # OCR y-sort artifact anchor_skip_before_sum exists for):
            # anchor-shaped, immediately before 合计 -> must fold
            toks.append(_tok(r.choice(_ZH_WORDS), 40, y, ch_w=12.0))
            y += 22.0
    toks += [_tok("合", 40, y, ch_w=12.0), _tok("计", 56, y, ch_w=12.0)]
    toks.append(_tok(f"¥{total:.2f}", 470, y))
    y += 30.0
    toks.append(_tok("开票人:王五", 40, y, ch_w=12.0))
    # the zh page is wider than the en one so region maths differ
    toks.append(_tok(".", 640, y + 20))
    return toks


def _invoice_zh_special_doc(r: random.Random, seq: int) -> list[dict]:
    """Property-special variant (matches builtin invoice_zh_special):
    special title part, required 产权证号 anchor, cert/area table
    columns instead of qty/price."""
    toks: list[dict] = []
    toks.append(_tok("电子发票（专用发票）", 200, 30, ch_w=14.0))
    toks.append(_tok("发票号码:", 40, 70, ch_w=12.0))
    toks.append(_tok(f"{35000000 + seq}", 110, 70))
    toks.append(_tok(f"开票日期:2025年{1 + seq % 12}月{1 + seq % 28}日", 340, 70, ch_w=12.0))
    buyer = "".join(r.choice(_ZH_WORDS) for _ in range(2)) + "有限公司"
    seller = "".join(r.choice(_ZH_WORDS) for _ in range(2)) + "置业"
    toks.append(_tok(f"名称:{buyer}", 40, 110, ch_w=12.0))
    toks.append(_tok(f"名称:{seller}", 330, 110, ch_w=12.0))
    toks += [
        _tok("项目名称", 40, 160, ch_w=12.0),
        _tok("产权证号", 250, 160, ch_w=12.0),
        _tok("面积", 400, 160, ch_w=12.0),
        _tok("金额", 490, 160, ch_w=12.0),
    ]
    y = 190.0
    total = 0.0
    for _ in range(r.randint(1, 2)):
        area = r.randint(500, 2000) / 10.0
        amount = round(area * r.randint(80, 120), 2)
        total = round(total + amount, 2)
        # split name/number lines, same shape as the general zh family
        toks.append(_tok("*不动产*" + r.choice(_ZH_WORDS), 40, y, ch_w=12.0))
        toks += [
            _tok(f"证{seq:07d}号", 250, y + 14, ch_w=12.0),
            _tok(f"{area:.1f}", 400, y + 14),
            _tok(f"{amount:.2f}", 490, y + 14),
        ]
        y += 36.0
    toks += [_tok("合", 40, y, ch_w=12.0), _tok("计", 56, y, ch_w=12.0)]
    toks.append(_tok(f"¥{total:.2f}", 490, y))
    y += 30.0
    toks.append(_tok("开票人:赵六", 40, y, ch_w=12.0))
    toks.append(_tok(".", 660, y + 20))
    return toks


# ---------------------------------------------------------------------------


def make_page(seq: int, seed: int = 42, giant_repeat: int = 60) -> dict:
    """Build one corpus row deterministically from (seed, seq)."""
    family = _FAMILY_WHEEL[seq % len(_FAMILY_WHEEL)]
    r = _rng(seed, seq)
    url = f"https://example-{family}.test/{seq:06d}"
    ts = _BASE_TS + timedelta(seconds=137 * seq)
    lang = "en"
    if family == "empty":
        html_bytes, text = b"", ""
    elif family == "boilerplate":
        html, text = _html_article(r, heavy=True)
        html_bytes = html.encode("utf-8")
    elif family == "article":
        html, text = _html_article(r, heavy=False)
        html_bytes = html.encode("utf-8")
    elif family == "giantblob":
        html, text = _html_article(r, heavy=True, repeat=giant_repeat)
        html_bytes = html.encode("utf-8")
    elif family == "multicolumn":
        toks = _multicolumn_doc(r)
        html_bytes, text = _pdftok_bytes(toks), _pdftok_text(toks)
    elif family == "nonlatin":
        toks = _invoice_zh_doc(r, seq)
        html_bytes, text = _pdftok_bytes(toks), _pdftok_text(toks)
        lang = "zh"
    elif family == "regionsplit":
        toks = _invoice_zh_doc(r, seq, region_split=True)
        html_bytes, text = _pdftok_bytes(toks), _pdftok_text(toks)
        lang = "zh"
    elif family == "zhspecial":
        toks = _invoice_zh_special_doc(r, seq)
        html_bytes, text = _pdftok_bytes(toks), _pdftok_text(toks)
        lang = "zh"
    elif family == "splitanchor":
        toks = _invoice_en_doc(r, seq, split_title=True)
        html_bytes, text = _pdftok_bytes(toks), _pdftok_text(toks)
    elif family == "multilinerow":
        toks = _invoice_en_doc(r, seq, multiline=True)
        html_bytes, text = _pdftok_bytes(toks), _pdftok_text(toks)
    elif family == "summissing":
        toks = _invoice_en_doc(r, seq, omit_sum=True)
        html_bytes, text = _pdftok_bytes(toks), _pdftok_text(toks)
    elif family == "lastrowfold":
        toks = _invoice_zh_doc(r, seq, last_row_fold=True)
        html_bytes, text = _pdftok_bytes(toks), _pdftok_text(toks)
        lang = "zh"
    elif family == "firstrowanchor":
        toks = _invoice_en_doc(r, seq, first_row_anchor=True)
        html_bytes, text = _pdftok_bytes(toks), _pdftok_text(toks)
    elif family == "rotated":
        toks = _rotate_cw(_invoice_en_doc(r, seq))
        html_bytes, text = _pdftok_bytes(toks), _pdftok_text(toks)
    elif family == "rotated180":
        toks = _rotate_cw(_rotate_cw(_invoice_en_doc(r, seq)))
        html_bytes, text = _pdftok_bytes(toks), _pdftok_text(toks)
    elif family == "rotated270":
        toks = _rotate_cw(_rotate_cw(_rotate_cw(_invoice_en_doc(r, seq))))
        html_bytes, text = _pdftok_bytes(toks), _pdftok_text(toks)
    elif family == "multipage":
        toks = _multipage_doc(r, seq)
        html_bytes, text = _pdftok_bytes(toks), _pdftok_text(toks)
    else:  # pragma: no cover
        raise AssertionError(family)
    return {
        "url": url,
        "warc_ts": ts,
        "html": html_bytes,
        "text": text,
        "lang": lang,
    }


def generate_pages(n: int, seed: int = 42) -> list[dict]:
    return [make_page(i, seed=seed) for i in range(n)]


def write_corpus_parquet(path: str, n: int, seed: int = 42) -> None:
    """Write the corpus with plain pyarrow (Spark not required — the
    golden generator is single-process by design)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = generate_pages(n, seed=seed)
    schema = pa.schema(
        [
            pa.field("url", pa.string()),
            pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
            pa.field("html", pa.binary()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
        ]
    )
    table = pa.Table.from_pylist(rows, schema=schema)
    # ~8-16 MB row groups (2048 rows x ~4.5 KB): the layout a real
    # corpus writer (Iceberg/parquet at 128 MB files) produces, and what
    # lets the scan parallelize without a pre-kernel exchange — a single
    # 60k-row group would serialize the whole map stage onto one task.
    pq.write_table(table, path, row_group_size=2048)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("-n", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    write_corpus_parquet(args.path, args.n, seed=args.seed)
    print(f"wrote {args.n} pages -> {args.path}")
