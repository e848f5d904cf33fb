"""Fast HTML event scanner — drop-in driver for the block tokenizer.

``html.parser.HTMLParser`` is ~93% of extraction kernel time (its
char-by-char goahead loop + updatepos bookkeeping). This scanner walks the
document with ``str.find`` + one compiled tag regex and feeds the SAME
handler callbacks (``handle_starttag/handle_endtag/handle_data``), so block
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

# full tag: </?name attrs> with quote-aware attr skipping; $ alternative is
# intentionally absent — an unterminated tag is handled by the caller
_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][^\t\n\r\f />]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>"
)

_CDATA_ELEMS = ("script", "style")  # HTMLParser's CDATA_CONTENT_ELEMENTS

# case-insensitive close-tag scan on the original string — str.lower() can
# CHANGE LENGTH (e.g. 'İ' U+0130 -> 2 chars), so offsets found in a
# lowered copy must never be used to slice the original
_CDATA_CLOSE_RE = {name: re.compile("</" + name, re.I) for name in _CDATA_ELEMS}


def scan(s: str, handler) -> None:
    """Drive ``handler`` (handle_starttag/handle_endtag/handle_data) over
    the HTML string ``s``."""
    n = len(s)
    pos = 0
    find = s.find
    while pos < n:
        lt = find("<", pos)
        if lt == -1:
            handler.handle_data(unescape(s[pos:]))
            return
        if lt > pos:
            handler.handle_data(unescape(s[pos:lt]))
        c = s[lt + 1 : lt + 2]
        if c == "!":
            if s.startswith("<!--", lt):
                end = find("-->", lt + 4)
                pos = n if end == -1 else end + 3
            else:
                end = find(">", lt + 2)
                pos = n if end == -1 else end + 1
        elif c == "?":
            end = find(">", lt + 2)
            pos = n if end == -1 else end + 1
        elif c == "/" or (c and (("a" <= c <= "z") or ("A" <= c <= "Z"))):
            m = _TAG_RE.match(s, lt)
            if m is None:
                # unterminated/garbled tag: HTMLParser buffers it to EOF
                # if no further '<' completes it; tolerant fallback: skip
                # to the next '<' and resume
                nxt = find("<", lt + 1)
                if nxt == -1:
                    return
                pos = nxt
                continue
            closing, name, _attrs, selfclose = m.groups()
            name = name.lower()
            pos = m.end()
            if closing:
                handler.handle_endtag(name)
            else:
                handler.handle_starttag(name, ())
                if selfclose:
                    handler.handle_endtag(name)
                elif name in _CDATA_ELEMS:
                    # raw text until the matching close tag (case-insens);
                    # content is NOT unescaped (CDATA), and our handler
                    # drops it anyway (script/style are SKIP_TAGS)
                    mc = _CDATA_CLOSE_RE[name].search(s, pos)
                    if mc is None:
                        handler.handle_data(s[pos:])
                        return
                    close = mc.start()
                    handler.handle_data(s[pos:close])
                    gt = find(">", close)
                    handler.handle_endtag(name)
                    pos = n if gt == -1 else gt + 1
        else:
            # lone '<' (e.g. "<3"): data; continue scanning after it
            handler.handle_data("<")
            pos = lt + 1
