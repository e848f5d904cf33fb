"""Fast HTML event scanner — drop-in driver for the block tokenizer.

``html.parser.HTMLParser`` is ~93% of extraction kernel time (its
char-by-char goahead loop + updatepos bookkeeping). This scanner instead
walks the document with ONE compiled alternation (`_SCAN_RE`) — a single
C-level ``search`` per markup construct — and feeds the SAME handler
callbacks (``handle_starttag/handle_endtag/handle_data``), so block
construction and scoring logic live in exactly one place
(:mod:`document_ai_spark.kernel.html_extract`).

Equivalence contract (tested in tests/test_fast_html.py against HTMLParser
on the full synthetic corpus + adversarial fuzz):
  * text runs are unescaped with html.unescape — identical to
    HTMLParser(convert_charrefs=True), which calls unescape on text runs;
  * <script>/<style> content is CDATA until the matching close tag, and is
    NOT unescaped — same as HTMLParser's CDATA_CONTENT_ELEMENTS;
  * comments/declarations/processing instructions are skipped; a lone '<'
    that does not open a tag is data; an unterminated tag at EOF is
    dropped (HTMLParser leaves it buffered);
  * self-closing tags fire starttag then endtag (handle_startendtag
    default behavior).

Divergence (documented, irrelevant to the block model): CDATA sections
(``<![CDATA[..]]>`` containing '>') and comments containing '--!>' may
terminate earlier than HTML5 spec; neither occurs in sane web text, and the
kernel remains total either way.
"""

from __future__ import annotations

import re
from html import unescape

_CDATA_ELEMS = ("script", "style")  # HTMLParser's CDATA_CONTENT_ELEMENTS

# case-insensitive close-tag scan on the original string — str.lower() can
# CHANGE LENGTH (e.g. 'İ' U+0130 -> 2 chars), so offsets found in a
# lowered copy must never be used to slice the original
_CDATA_CLOSE_RE = {name: re.compile("</" + name, re.I) for name in _CDATA_ELEMS}


# One alternation matching EVERY construct a '<' can open, tried in the
# same precedence order as the branchy loop it replaced (comment, decl/PI,
# full tag, garbled-tag start, lone '<'). Every '<' matches one branch, so
# the gap between consecutive matches never contains '<' — the whole
# find-next-'<' + classify + match dance collapses into ONE C-level
# search per construct (was ~45% of kernel time as separate calls).
_SCAN_RE = re.compile(
    r"<!--.*?(?:-->|\Z)"                 # comment (to --> or EOF)
    r"|<[!?][^>]*(?:>|\Z)"               # declaration / processing instr
    r"|<(/?)([a-zA-Z][^\t\n\r\f />]*)"   # full tag: closing?, name,
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>"  # quote-aware attrs, self?
    r"|<(?=[a-zA-Z/])"                   # garbled tag: drop to next '<'
    r"|<",                               # lone '<' (e.g. '<3'): data
    re.S,
)


def scan(s: str, handler) -> None:
    """Drive ``handler`` (handle_starttag/handle_endtag/handle_data) over
    the HTML string ``s``."""
    n = len(s)
    pos = 0
    search = _SCAN_RE.search
    find = s.find
    h_data = handler.handle_data
    h_start = handler.handle_starttag
    h_end = handler.handle_endtag
    dropping = False  # inside a garbled tag: text to next '<' is discarded
    while True:
        m = search(s, pos)
        if m is None:
            if pos < n and not dropping:
                h_data(unescape(s[pos:]))
            return
        lt = m.start()
        if lt > pos and not dropping:
            h_data(unescape(s[pos:lt]))
        dropping = False
        closing, name, _attrs, selfclose = m.group(1, 2, 3, 4)
        pos = m.end()
        if name is not None:  # full tag
            name = name.lower()
            if closing:
                h_end(name)
            else:
                h_start(name, ())
                if selfclose:
                    h_end(name)
                elif name in _CDATA_ELEMS:
                    # raw text until the matching close tag, matched
                    # case-insensitively on the ORIGINAL string (str.lower
                    # can change length, e.g. 'İ'); content is NOT
                    # unescaped (CDATA) and our handler drops it anyway
                    # (script/style are SKIP_TAGS)
                    mc = _CDATA_CLOSE_RE[name].search(s, pos)
                    if mc is None:
                        h_data(s[pos:])
                        return
                    close = mc.start()
                    h_data(s[pos:close])
                    gt = find(">", close)
                    h_end(name)
                    pos = n if gt == -1 else gt + 1
        elif pos - lt == 1:  # single '<' consumed: garbled tag or lone '<'
            nc = s[pos : pos + 1]
            if nc == "/" or ("a" <= nc <= "z") or ("A" <= nc <= "Z"):
                # unterminated/garbled tag: HTMLParser buffers it to EOF
                # if no further '<' completes it; tolerant fallback: skip
                # to the next '<' and resume, dropping the garbled text
                dropping = True
            else:
                h_data("<")
        # else: comment/declaration/PI — skipped entirely
