"""Unit tests for the HTML extraction kernel (pure Python, no Spark)."""

from document_ai_spark.kernel.extract import blake2b_hex, extract_document
from document_ai_spark.kernel.html_extract import extract_html, keep_block, tokenize_blocks

ARTICLE = (
    b"<html><head><title>T</title><meta charset='utf-8'><script>var x=1;</script></head>"
    b"<body><nav><a href='/a'>home</a> <a href='/b'>about</a></nav>"
    b"<article><p>Hello world this is the main content paragraph with lots of text.</p>"
    b"<p>Second paragraph here with even more interesting text content.</p></article>"
    b"<footer><a href='/c'>contact</a> copyright</footer></body></html>"
)


def test_article_kept_boilerplate_dropped():
    text, spans = extract_html(ARTICLE)
    assert "main content paragraph" in text
    assert "Second paragraph" in text
    assert "home" not in text and "copyright" not in text and "var x=1" not in text
    assert len(spans) == 2
    assert [s["tag"] for s in spans] == ["p", "p"]


def test_span_offsets_reconstruct_text():
    text, spans = extract_html(ARTICLE)
    for s in spans:
        seg = text[s["char_start"] : s["char_end"]]
        assert seg and "\n" not in seg
    joined = "\n\n".join(text[s["char_start"] : s["char_end"]] for s in spans)
    assert joined == text


def test_link_density_drops_link_soup():
    soup = (
        b"<html><body><div>"
        + b" ".join(b'<a href="/x">click here now</a>' for _ in range(30))
        + b"</div></body></html>"
    )
    text, spans = extract_html(soup)
    assert text == "" and spans == []


def test_long_div_outside_article_kept():
    payload = (
        b"<html><body><div>"
        + b"This is a long wrapper div with plenty of prose content and no links at all. " * 3
        + b"</div></body></html>"
    )
    text, _ = extract_html(payload)
    assert "long wrapper div" in text


def test_short_p_dropped_outside_article():
    text, _ = extract_html(b"<html><body><p>too short</p></body></html>")
    assert text == ""


def test_markdown_mode_structure_markers():
    payload = (
        b"<html><body><article><h1>Top Title Of The Document</h1>"
        b"<p>First paragraph with plenty of characters to be kept around here.</p>"
        b"<h3>Deeper section heading text</h3>"
        b"<ul><li>List item with enough prose to clear the keep threshold.</li></ul>"
        b"<blockquote>A quoted passage with enough text to be retained too.</blockquote>"
        b"</article></body></html>"
    )
    text, spans = extract_html(payload, markdown=True)
    assert text.startswith("# Top Title Of The Document")
    assert "\n\n### Deeper section heading text" in text
    assert "\n\n- List item" in text
    assert "\n\n> A quoted passage" in text
    # offsets include the markers: reconstruction invariant holds
    for s in spans:
        assert text[s["char_start"] : s["char_end"]]
    assert "\n\n".join(text[s["char_start"] : s["char_end"]] for s in spans) == text
    # plain mode is unchanged by the feature
    assert "#" not in extract_html(payload)[0]


def test_malformed_html_no_crash():
    cases = [
        b"<html><body><article><p>Unclosed paragraph with enough characters to be kept here",
        b"</div></p></article>stray end tags",
        b"<html><p>" + b"\xff\xfe\x80" + b" bad bytes but plenty of text follows after them ok</p>",
        b"<a><a><a>nested anchors with words</a>",
    ]
    for c in cases:
        doc_hash, kind, text, spans, n, nb, err = extract_document(c)
        assert err is None
        assert kind in ("html", "empty")


def test_invalid_utf8_replacement_deterministic():
    payload = b"<html><body><article><p>Valid \xff\xfe invalid bytes, text continues for long enough.</p></article>"
    t1, _ = extract_html(payload)
    t2, _ = extract_html(payload)
    assert t1 == t2 and "�" in t1


def test_empty_and_whitespace_kind():
    assert extract_document(b"")[1] == "empty"
    assert extract_document(b"   \n\t ")[1] == "empty"
    assert extract_document(None)[1] == "empty"


def test_blake2b_matches_reference_params():
    import hashlib

    data = b"x" * 300_000
    # reference streams in 128000-byte chunks (hash_file.py:5-19): same digest
    h = hashlib.blake2b(digest_size=32)
    for i in range(0, len(data), 128_000):
        h.update(data[i : i + 128_000])
    assert blake2b_hex(data) == h.hexdigest()


def test_densities_are_ratios_of_counts():
    blocks = tokenize_blocks(
        "<body><p><a href='/x'>link text</a> and some unlinked prose words here</p></body>"
    )
    assert len(blocks) == 1
    b = blocks[0]
    assert 0 < b.link_density < 1
    assert b.text_density > 0
    assert keep_block(b) is (b.n_chars >= 25 and b.link_density < 1 / 3)


# ---------------------------------------------------------------------------
# round 5: charset sniffing (BOM > meta > utf-8)


def test_decode_html_bytes_boms():
    from document_ai_spark.kernel.html_extract import decode_html_bytes

    s = "<p>naïve café — é</p>"
    assert decode_html_bytes(b"\xef\xbb\xbf" + s.encode("utf-8")) == s
    assert decode_html_bytes(s.encode("utf-16")) == s            # LE BOM
    assert decode_html_bytes(b"\xfe\xff" + s.encode("utf-16-be")) == s
    assert decode_html_bytes(b"\xff\xfe\x00\x00" + s.encode("utf-32-le")) == s
    assert decode_html_bytes(b"\x00\x00\xfe\xff" + s.encode("utf-32-be")) == s


def test_decode_html_bytes_meta_charset():
    from document_ai_spark.kernel.html_extract import decode_html_bytes

    body = '<html><head><meta charset="windows-1252"></head><body>Café touché</body></html>'
    assert "Café touché" in decode_html_bytes(body.encode("cp1252"))
    # http-equiv spelling + latin-1 alias map to windows-1252 too
    legacy = (
        '<html><head><meta http-equiv="Content-Type" '
        'content="text/html; charset=ISO-8859-1"></head><body>résumé \x97 dash</body></html>'
    )
    out = decode_html_bytes(legacy.encode("latin-1").replace(b"\xc3\xa9", b"\xe9"))
    # \x97 is an em dash in cp1252 (undefined in latin-1 proper) — the
    # WHATWG alias mapping is what makes it decode
    assert "—" in out
    # shift_jis via python codec lookup
    sj = '<meta charset="shift_jis"><p>日本語テキスト</p>'.encode("shift_jis")
    assert "日本語テキスト" in decode_html_bytes(sj)


def test_decode_html_bytes_false_utf16_claim_and_unknown_label():
    from document_ai_spark.kernel.html_extract import decode_html_bytes

    # a BOM-less 8-bit stream claiming utf-16: WHATWG says treat as utf-8
    p = b'<meta charset="utf-16"><p>plain ascii body</p>'
    assert "plain ascii body" in decode_html_bytes(p)
    # unknown label falls back to utf-8/replace, total
    q = '<meta charset="x-not-a-codec"><p>fallback café</p>'.encode("utf-8")
    assert "fallback café" in decode_html_bytes(q)
    # sniff window: a charset= beyond 1024 bytes is ignored
    far = b"<html>" + b" " * 1100 + '<meta charset="windows-1252">café'.encode("cp1252")
    assert "caf" in decode_html_bytes(far)  # decoded as utf-8, é replaced


def test_utf16_page_extracts_clean_text():
    from document_ai_spark.kernel.extract import extract_document
    from document_ai_spark.sources.pages import _EDGE_CASES

    cases = dict(_EDGE_CASES)
    dh, kind, text, spans, n_chars, n_blocks, err = extract_document(cases["utf16le"])
    assert kind == "html" and err is None
    assert text.startswith("Première página — naïve café")
    assert "\x00" not in text and "�" not in text
    dh, kind, text, *_ = extract_document(cases["charset-1252"])
    assert kind == "html" and text.startswith("Café résumé naïve touché")
    assert "�" not in text
