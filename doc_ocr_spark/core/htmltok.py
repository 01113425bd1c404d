"""From-scratch HTML tokenizer -> lightweight DOM block array.

Replaces the reference's OCR token producers (paddle_ocr.py:121-226,
hunyuan_ocr.py:120-147 produce flat positioned-token lists); for HTML
payloads the analogous atomic unit is a *text block*: a run of visible
text delimited by block-level tags, annotated with tag, nesting depth,
word counts and link-word counts so the boilerplate classifier
(boilerplate.py) can score it.

Implementation is stdlib ``html.parser`` only (no lxml/bs4 in the target
environment — and "from scratch" is the point).  Deterministic: the block
list depends only on the input bytes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape
from html.parser import HTMLParser

# Tags whose entire subtree is invisible — the analogue of the reference's
# table-line suppression (preprocess.py:207-241): structure that must never
# contribute to content statistics.
_SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "iframe", "head",
     "object", "embed", "title", "meta", "link", "base"}
)

# Tags that terminate the current text block when opened or closed.
_BLOCK_TAGS = frozenset(
    {"address", "article", "aside", "blockquote", "body", "br", "caption",
     "dd", "details", "div", "dl", "dt", "fieldset", "figcaption", "figure",
     "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr",
     "html", "legend", "li", "main", "nav", "ol", "option", "p", "pre",
     "section", "select", "summary", "table", "tbody", "td", "tfoot", "th",
     "thead", "tr", "ul"}
)

# void elements never pushed on the open-tag stack
_VOID_TAGS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
     "meta", "param", "source", "track", "wbr"}
)

# semantic ancestors recorded on each block so the classifier can
# down-weight navigation chrome
_CHROME_TAGS = frozenset({"nav", "header", "footer", "aside"})


@dataclass
class Block:
    """One visible text block (SURVEY.md §1.4 'Lightweight DOM')."""

    tag: str                 # nearest enclosing block-level tag
    depth: int               # DOM nesting depth at block start
    text: str                # whitespace-collapsed visible text
    n_words: int = 0
    n_link_words: int = 0
    in_chrome: bool = False  # under nav/header/footer/aside
    is_heading: bool = False

    @property
    def link_density(self) -> float:
        return self.n_link_words / self.n_words if self.n_words else 0.0


@dataclass
class _ParserState:
    blocks: list[Block] = field(default_factory=list)
    parts: list[str] = field(default_factory=list)
    link_parts: list[str] = field(default_factory=list)
    cur_tag: str = "body"
    cur_depth: int = 0
    chrome_depth: int = 0
    anchor_depth: int = 0
    skip_depth: int = 0


class _BlockParser(HTMLParser):
    """Event-driven block builder.

    Mirrors the regex-cursor scanning pattern of the reference's VLM output
    parser (hunyuan_ocr.py:128-146): a single forward pass with explicit
    state, never backtracking.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.st = _ParserState()
        self._stack: list[str] = []

    # -- block lifecycle -------------------------------------------------
    def _flush(self) -> None:
        st = self.st
        if not st.parts:  # nothing accumulated — the common block-tag case
            st.link_parts = []
            return
        raw = " ".join("".join(st.parts).split())
        st.parts = []
        # link words counted over the COLLAPSED anchor text, so the
        # count is independent of how the parser chunked handle_data
        # calls (parser-granularity-proof — required for fast-scanner /
        # stdlib equivalence on literal '<' inside anchors)
        link_words = len("".join(st.link_parts).split())
        st.link_parts = []
        if not raw:
            return
        words = raw.split()
        st.blocks.append(
            Block(
                tag=st.cur_tag,
                depth=st.cur_depth,
                text=raw,
                n_words=len(words),
                n_link_words=min(link_words, len(words)),
                in_chrome=st.chrome_depth > 0,
                is_heading=st.cur_tag in ("h1", "h2", "h3", "h4", "h5", "h6"),
            )
        )

    # -- parser events ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        st = self.st
        if tag in _SKIP_TAGS:
            if tag not in _VOID_TAGS:
                st.skip_depth += 1
                self._stack.append(tag)
            return
        if st.skip_depth:
            if tag not in _VOID_TAGS:
                self._stack.append(tag)
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            st.cur_tag = tag
            st.cur_depth = len(self._stack)
        if tag in _CHROME_TAGS:
            st.chrome_depth += 1
        if tag == "a":
            st.anchor_depth += 1
        if tag not in _VOID_TAGS:
            self._stack.append(tag)

    def handle_endtag(self, tag: str) -> None:
        st = self.st
        # pop to matching open tag (tolerant of misnesting)
        if tag in self._stack:
            while self._stack:
                popped = self._stack.pop()
                if popped in _SKIP_TAGS:
                    st.skip_depth = max(0, st.skip_depth - 1)
                if popped in _CHROME_TAGS:
                    st.chrome_depth = max(0, st.chrome_depth - 1)
                if popped == "a":
                    st.anchor_depth = max(0, st.anchor_depth - 1)
                    # word boundary between ADJACENT anchors, so two
                    # link texts never fuse into one counted word
                    st.link_parts.append(" ")
                if popped == tag:
                    break
        if st.skip_depth:
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            st.cur_tag = self._nearest_block_tag()
            st.cur_depth = len(self._stack)

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in ("br", "hr"):
            self._flush()

    def handle_data(self, data: str) -> None:
        st = self.st
        if st.skip_depth or not data:
            return
        st.parts.append(data)
        if st.anchor_depth:
            st.link_parts.append(data)

    def _nearest_block_tag(self) -> str:
        for t in reversed(self._stack):
            if t in _BLOCK_TAGS:
                return t
        return "body"


def tokenize_html_htmlparser(html: str) -> list[Block]:
    """Reference tokenizer on stdlib ``html.parser`` — kept as the
    cross-check oracle for the fast scanner below (equivalence asserted
    over the full synthetic corpus in tests/test_htmltok.py)."""
    p = _BlockParser()
    p.feed(html)
    p.close()
    p._flush()
    return p.st.blocks


# -- fast scanner ----------------------------------------------------------
#
# html.parser spends most of its time in per-construct regex dispatch
# (parse_starttag/parse_endtag were ~45% of the HTML kernel path under
# cProfile).  This scanner mirrors goahead's dispatch structure — find
# '<' (C-speed str.find), branch on the next character — but with
# compiled whole-construct regexes for end tags/comments/decls/PIs and a
# bare-tag fast path, feeding the SAME _BlockParser state machine; the
# stdlib path remains as the oracle.
#
# Replicated html.parser behaviours (convert_charrefs=True):
# - tag names case-folded; attributes tolerated incl. quoted '>'
# - character/entity refs resolved in text (html.unescape)
# - comments / doctype / processing instructions skipped
# - marked sections '<![kw ...': stdlib-identical for the DEFINED
#   keyword classes — temp/cdata/ignore/include/rcdata close at
#   ']]>' (whitespace-tolerant, so '<![CDATA[x] ]>' too), MS
#   conditionals if/else/endif at ']>'; content skipped (HTMLParser's
#   unknown_decl is a no-op).  DIVERGENCE (intentional, crawler-safe):
#   where the stdlib CRASHES — unknown keyword '<![foo]>' or a
#   non-name '<![123]>' raise AssertionError in _markupbase — this
#   scanner skips to the first '>' like a bogus declaration instead
# - script/style bodies are CDATA: no tags until the matching close;
#   unterminated -> rest of document swallowed
# - '<' not starting a construct is literal text
# - an UNTERMINATED construct uses goahead's close() fallback: emit
#   data up to (and including) the next '>' and RESUME parsing there —
#   content after that '>' is parsed normally, not swallowed
_NAME_RE = re.compile(r"[a-zA-Z][^\t\n\r\f />\x00]*")  # tagfind_tolerant charset
# parse_endtag's strict form: '</' ws* name ws* '>'
_ENDTAG_STRICT = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_DECL_RE = re.compile(r"<!(?!--)[^>]*>")  # '<!--' prefix is ONLY a comment
# marked sections '<![...': stdlib parse_marked_section machinery
_MS_NAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")  # _declname_match
_MS_SGML = {"temp", "cdata", "ignore", "include", "rcdata"}
_MS_COND = {"if", "else", "endif"}
_MS_CLOSE = re.compile(r"]\s*]\s*>")    # _markedsectionclose
_MS_MSCLOSE = re.compile(r"]\s*>")      # _msmarkedsectionclose
_PI_RE = re.compile(r"<\?[^>]*>")
_CDATA_CLOSE = {
    t: re.compile(rf"</\s*{t}\s*>", re.I) for t in ("script", "style")
}

# Start tags delegate to the stdlib parser's OWN parse_starttag (linear
# time, one call per tag): attr semantics — quoted '>', unquoted values
# absorbing a trailing '/' (NOT self-closing), the data-bail path for
# malformed tags, startendtag detection — are stdlib-identical by
# construction.  The previous hand-rolled attrs pattern was both subtly
# wrong for unquoted values ending in '/' (misread as self-closing) and
# exponential on unterminated tags with runs of lone quotes; found by
# review + execution, regression-tested below and in test_htmltok.


def _skip_cdata(p: _BlockParser, html: str, tag: str, pos: int, n: int) -> int:
    """Jump over a script/style CDATA body: no tags until the matching
    close; unterminated swallows the rest of the document.  The body is
    never emitted — _BlockParser drops it anyway (skip_depth > 0)."""
    cm = _CDATA_CLOSE[tag].search(html, pos)
    if cm is None:
        return n
    p.handle_endtag(tag)
    return cm.end()


def tokenize_html(html: str) -> list[Block]:
    """Parse HTML text into an ordered list of visible text blocks.

    Tolerant of malformed markup; never raises on bad nesting.  The
    caller maps catastrophic errors to the ``parse_error`` taxonomy row
    (never a thrown task).
    """
    p = _BlockParser()
    p.rawdata = html  # parse_starttag reads self.rawdata at an offset
    data = p.handle_data
    n = len(html)
    pos = 0

    def incomplete(i: int) -> int:
        """goahead's close()-time fallback for a construct with no
        terminator: emit data through the next '>' (or up to the next
        '<', or one char) and resume parsing there."""
        k = html.find(">", i + 1)
        if k < 0:
            k = html.find("<", i + 1)
            k = i + 1 if k < 0 else k
        else:
            k += 1
        data(unescape(html[i:k]))
        return k

    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            break
        if lt > pos:
            seg = html[pos:lt]
            data(unescape(seg) if "&" in seg else seg)
        c = html[lt + 1:lt + 2]
        if c and (("a" <= c <= "z") or ("A" <= c <= "Z")):
            nm = _NAME_RE.match(html, lt + 1)
            tag = nm.group(0).lower()
            # exact fast path: '<name>' with no attrs at all — nothing
            # for the attr machinery to decide (the bulk of real tags)
            if html.startswith(">", nm.end()):
                p.handle_starttag(tag, [])
                pos = nm.end() + 1
                if tag in _CDATA_CLOSE:
                    pos = _skip_cdata(p, html, tag, pos, n)
                continue
            # otherwise run the stdlib's own parse_starttag here (fires
            # handle_starttag / handle_startendtag / the data-bail
            # exactly like the oracle; -1 = unterminated)
            endpos = p.parse_starttag(lt)
            if endpos < 0:
                pos = incomplete(lt)
                continue
            pos = endpos
            if p.cdata_elem is not None:  # entered script/style CDATA
                p.clear_cdata_mode()
                pos = _skip_cdata(p, html, tag, pos, n)
        elif c == "/":
            # parse_endtag's exact branch order: strict '</ws*name ws*>',
            # else (with some '>' ahead) lenient name-at-i+2 consuming to
            # the '>' after it, else literal '</>', else bogus comment
            m = _ENDTAG_STRICT.match(html, lt)
            if m is not None:
                p.handle_endtag(m.group(1).lower())
                pos = m.end()
                continue
            if html.find(">", lt + 1) < 0:
                pos = incomplete(lt)
                continue
            nm = _NAME_RE.match(html, lt + 2)
            if nm is not None:
                p.handle_endtag(nm.group(0).lower())
                pos = html.find(">", nm.end()) + 1  # '>' exists (checked)
                if pos == 0:  # '>' only before the name end: bogus-ish
                    pos = incomplete(lt)
            elif html.startswith("</>", lt):
                pos = lt + 3
            else:
                gt = html.find(">", lt + 2)
                pos = (gt + 1) if gt >= 0 else incomplete(lt)
        elif c == "!":
            if html.startswith("<!--", lt):
                m = _COMMENT_RE.match(html, lt)
                pos = m.end() if m else incomplete(lt)
            elif html.startswith("<![", lt):
                # marked section — _markupbase.parse_marked_section:
                # sgml keywords close at ']]>' (whitespace-tolerant),
                # MS conditionals (if/else/endif) at ']>'; content is
                # unknown_decl (a no-op in HTMLParser), i.e. skipped
                nm = _MS_NAME.match(html, lt + 3)
                kw = nm.group(0).strip().lower() if nm else None
                if kw in _MS_SGML:
                    m = _MS_CLOSE.search(html, lt + 3)
                    pos = m.end() if m else incomplete(lt)
                elif kw in _MS_COND:
                    m = _MS_MSCLOSE.search(html, lt + 3)
                    pos = m.end() if m else incomplete(lt)
                else:
                    # stdlib CRASHES here (AssertionError: unknown
                    # status keyword / expected name token) — a crawler
                    # kernel must not; documented divergence: skip to
                    # the first '>' like a bogus declaration
                    m = _DECL_RE.match(html, lt)
                    pos = m.end() if m else incomplete(lt)
            else:
                m = _DECL_RE.match(html, lt)
                pos = m.end() if m else incomplete(lt)
        elif c == "?":
            m = _PI_RE.match(html, lt)
            pos = m.end() if m else incomplete(lt)
        else:
            # literal '<' (incl. '<' at EOF): plain data, like goahead
            data("<")
            pos = lt + 1
    if pos < n:
        seg = html[pos:]
        data(unescape(seg) if "&" in seg else seg)
    p._flush()
    return p.st.blocks


def decode_html(payload: bytes) -> str:
    """bytes -> str; UTF-8 with replacement (corpus rule: never throw)."""
    return payload.decode("utf-8", errors="replace")
