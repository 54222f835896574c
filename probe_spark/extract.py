"""Deterministic HTML -> text extraction.

The web analog of the reference's block extraction: the reference classifies
HTML semantic/block elements via tree-sitter (src/language/html.rs:26-80);
here a pure-Python, dependency-free extractor produces the canonical ``text``
column from the ``html`` column.  The per-row invariant mandated by
BASELINE.json input_hint -- byte-identical extracted text per url -- is
defined AGAINST this extractor (FIXTURES.md SS1): fixtures generate
``text = extract_text(html)``, pytest asserts it for every row, and the
ingest pipeline recomputes it.

Rules (deterministic, total over arbitrary bytes):
  * decode utf-8 with replacement
  * drop <script>/<style>/<template>/<nav>/<footer>/<header>/<aside>
    subtrees (boilerplate)
  * drop everything outside <body> when a body tag exists
  * block-level element boundaries become newlines; inline tags vanish
  * entities unescaped; whitespace collapsed within lines; empty lines
    dropped; lines joined with a single '\n'
"""

from __future__ import annotations

from html import unescape
from html.parser import HTMLParser

_SKIP_SUBTREES = frozenset(
    ["script", "style", "template", "nav", "footer", "header", "aside", "noscript"]
)
_BLOCK_TAGS = frozenset(
    [
        "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
        "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "section",
        "article", "main", "figure", "figcaption", "hr", "dl", "dt", "dd",
        "body", "title",
    ]
)
_VOID_TAGS = frozenset(["br", "hr", "img", "input", "meta", "link"])


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.skip_depth = 0
        self.saw_body = False
        self.in_body = False
        self.in_head = False

    def handle_starttag(self, tag, attrs):
        if tag == "body":
            self.saw_body = True
            self.in_body = True
        if tag == "head":
            self.in_head = True
        if tag in _SKIP_SUBTREES:
            if tag not in _VOID_TAGS:
                self.skip_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES and tag not in _VOID_TAGS:
            if self.skip_depth > 0:
                self.skip_depth -= 1
            return
        if tag == "body":
            self.in_body = False
        if tag == "head":
            self.in_head = False
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_data(self, data):
        if self.skip_depth > 0 or self.in_head:
            return
        if self.saw_body and not self.in_body:
            return
        self.parts.append(data)


def extract_text(html: bytes | str | None) -> str:
    """Extract canonical plain text from an HTML document.  Total and
    deterministic: same bytes in, same string out, never raises."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    try:
        p = _Extractor()
        p.feed(html)
        p.close()
        raw = "".join(p.parts)
    except Exception:
        # pathological markup: strip tags crudely but deterministically
        import re

        raw = re.sub(r"<[^>]*>", "\n", html)
        raw = unescape(raw)
    lines = []
    for line in raw.split("\n"):
        collapsed = " ".join(line.split())
        if collapsed:
            lines.append(collapsed)
    return "\n".join(lines)
