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


# -- fast single-regex scanner -------------------------------------------
#
# html.parser spends most of its time in per-tag regex dispatch
# (parse_starttag/parse_endtag were ~45% of the HTML kernel path under
# cProfile).  This scanner walks the document with ONE compiled regex and
# feeds the SAME _BlockParser state machine, so block semantics are
# identical by construction; the stdlib path remains as the oracle.
#
# Replicated html.parser behaviours (convert_charrefs=True):
# - tag names case-folded; attributes tolerated incl. quoted '>'
# - character/entity refs resolved in text (html.unescape)
# - comments / doctype / CDATA sections / processing instructions skipped
# - script/style bodies are CDATA: no tags until the matching close;
#   unterminated -> rest of document swallowed
# - '<' not starting a construct falls through as literal text
_TAG_RE = re.compile(
    r"""<(?:
        !--.*?-->                       # comment
      | !\[CDATA\[.*?\]\]>              # CDATA section
      | !(?!--)[^>]*>                   # doctype / declaration (a '<!--'
                                        #  prefix is ONLY ever a comment —
                                        #  '<!-->' unterminated = data)
      | \?[^>]*>                        # processing instruction
        # NOTE: all constructs REQUIRE their terminator — html.parser
        # emits an unterminated one at EOF as literal data on close()
      | /\s*(?P<ename>[a-zA-Z][^\t\n\r\f\ />\x00]*)[^>]*>   # end tag (tolerant name + junk, like parse_endtag)
      | /(?!\s*[a-zA-Z])[^>]*>          # </ + non-name: bogus comment, swallowed to '>'
      | (?P<name>[a-zA-Z][^\t\n\r\f\ />\x00]*)  # tolerant name charset (tagfind_tolerant);
                                        # the start-tag END is found by the
                                        # stdlib's own attr machinery below
    )""",
    re.X | re.S,
)
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
    while pos < n:
        m = _TAG_RE.search(html, pos)
        if m is None:
            break
        if m.start() > pos:
            seg = html[pos:m.start()]
            data(unescape(seg) if "&" in seg else seg)
        pos = m.end()
        ename = m.group("ename")
        if ename:
            p.handle_endtag(ename.lower())
            continue
        name = m.group("name")
        if not name:
            continue  # comment/doctype/PI/CDATA/bogus end tag
        tag = name.lower()
        i = m.start()
        # exact fast path: '<name>' with no attrs at all — nothing for
        # the attr machinery to decide (the bulk of real tags: <p>,
        # <div>, <li>, ...)
        if html.startswith(">", m.end()):
            p.handle_starttag(tag, [])
            pos = m.end() + 1
            if tag in _CDATA_CLOSE:
                pos = _skip_cdata(p, html, tag, pos, n)
            continue
        # otherwise run the stdlib's own parse_starttag at this offset
        # (fires handle_starttag / handle_startendtag / the data-bail
        # exactly like the oracle; returns the end offset, -1 if the
        # tag is unterminated at EOF)
        endpos = p.parse_starttag(i)
        if endpos < 0:
            # unterminated -> literal trailing data (tail handler below)
            pos = i
            break
        pos = endpos
        if p.cdata_elem is not None:  # parse_starttag entered CDATA mode
            p.clear_cdata_mode()
            pos = _skip_cdata(p, html, tag, pos, n)
    if pos < n:
        seg = html[pos:]
        data(unescape(seg) if "&" in seg else seg)
    p._flush()
    return p.st.blocks


def decode_html(payload: bytes) -> str:
    """bytes -> str; UTF-8 with replacement (corpus rule: never throw)."""
    return payload.decode("utf-8", errors="replace")
