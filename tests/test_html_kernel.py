"""Byte-identity tests for the HTML extraction kernel (SURVEY.md §5.3)."""

import pytest

from westa_ocr_spark.kernel.html_extract import extract_html


def test_strips_boilerplate_keeps_content():
    html = (
        b"<html><head><title>T</title><style>p{}</style>"
        b"<script>var a='<p>no</p>';</script></head><body>"
        b'<nav><a href="/">Home</a> <a href="/x">X</a></nav>'
        b"<article><h1>Big Title</h1>"
        b"<p>First paragraph of real content here.</p>"
        b"<p>Second paragraph, also real.</p></article>"
        b'<footer><a href="/tos">Terms</a></footer></body></html>'
    )
    text, spans = extract_html(html)
    assert text == (
        "Big Title\n"
        "First paragraph of real content here.\n"
        "Second paragraph, also real."
    )
    assert [s["block_id"] for s in spans] == [1, 2, 3]
    assert [s["tag"] for s in spans] == ["h1", "p", "p"]


def test_span_offsets_are_utf8_byte_offsets():
    # both paragraphs inside one container so candidate selection
    # keeps them together — this test pins byte offsets, not selection
    html = "<body><article><p>café</p><p>あい</p></article></body>".encode()
    text, spans = extract_html(html)
    assert text == "café\nあい"
    raw = text.encode("utf-8")
    for s in spans:
        assert raw[s["start"] : s["end"]].decode("utf-8") in ("café", "あい")
    # 'café' = 5 bytes utf-8
    assert spans[0] == {"block_id": 1, "start": 0, "end": 5, "tag": "p"}
    assert spans[1] == {"block_id": 2, "start": 6, "end": 12, "tag": "p"}


def test_entity_and_whitespace_normalization():
    html = b"<p>caf&eacute; &amp;\t\n  co &#x3042;</p>"
    text, _ = extract_html(html)
    assert text == "café & co あ"


def test_link_density_drops_menus():
    # block that is entirely anchor text -> dropped
    html = (
        b'<div><a href="/a">aaa</a> <a href="/b">bbb</a></div>'
        b"<p>real content sentence that is long enough</p>"
    )
    text, spans = extract_html(html)
    assert text == "real content sentence that is long enough"
    assert len(spans) == 1


def test_mixed_block_below_density_threshold_kept():
    # 10 plain chars vs 3 anchor chars -> density 3/13 < 0.5 -> kept
    html = b'<p>plainplain <a href="/x">abc</a></p>'
    text, _ = extract_html(html)
    assert text == "plainplain abc"


def test_br_becomes_space():
    html = b"<p>one<br>two</p>"
    text, _ = extract_html(html)
    assert text == "one two"


def test_nested_div_segmentation_and_order():
    html = (
        b"<article><p>alpha</p><div><p>beta</p></div><p>gamma</p></article>"
    )
    text, spans = extract_html(html)
    assert text == "alpha\nbeta\ngamma"
    assert [s["block_id"] for s in spans] == [1, 2, 3]


def test_text_after_nested_block_resumes_parent():
    html = b"<div>before <p>inner</p> after</div>"
    text, spans = extract_html(html)
    assert text == "before\ninner\nafter"
    assert [s["tag"] for s in spans] == ["div", "p", "div"]


def test_undecodable_raises():
    # no BOM, no declaration, invalid UTF-8 -> strict decode raises
    with pytest.raises(UnicodeDecodeError):
        extract_html(b"\xff<html><p>bad</p>")
    # BOM'd UTF-16 with an odd-length (truncated) body also raises
    with pytest.raises(UnicodeDecodeError):
        extract_html(b"\xff\xfe\x00<html><p>bad bytes")


def test_charset_bom_utf16():
    # b"\xff\xfe" + even-length body IS valid BOM'd UTF-16-LE now
    body = "<p>héllo wörld text</p>".encode("utf-16-le")
    text, _ = extract_html(b"\xff\xfe" + body)
    assert text == "héllo wörld text"


def test_charset_meta_declarations():
    for label, codec, probe in [
        ("Shift_JIS", "cp932", "日本語の本文です"),
        ("EUC-KR", "cp949", "한국어 문장"),
        ("GB2312", "gbk", "中文正文"),
        ("windows-1252", "cp1252", "déjà façade"),
        ("latin-1", "cp1252", "café €uro"),  # WHATWG: latin-1 -> cp1252
    ]:
        doc = (
            f'<html><head><meta charset="{label}"></head>'
            f"<body><p>{probe} filler words here</p></body></html>"
        ).encode(codec)
        text, _ = extract_html(doc)
        assert text == f"{probe} filler words here", (label, text)
        # http-equiv form resolves identically
        doc2 = (
            '<html><head><meta http-equiv="Content-Type" '
            f'content="text/html; charset={label}"></head>'
            f"<body><p>{probe} filler words here</p></body></html>"
        ).encode(codec)
        assert extract_html(doc2)[0] == f"{probe} filler words here"


def test_charset_transport_hint_and_fallbacks():
    raw = "<p>garçon déjà</p>".encode("cp1252")
    # transport hint beats the (absent) meta declaration
    assert extract_html(raw, charset_hint="iso-8859-1")[0] == "garçon déjà"
    # unknown label falls back to strict UTF-8
    utf8 = '<meta charset="x-nope"><p>plain ascii here</p>'.encode()
    assert extract_html(utf8)[0] == "plain ascii here"
    # mislabeled page whose bytes fail the declared codec strictly
    # falls back to strict UTF-8 (0xC2 0x81 is valid UTF-8 but 0x81
    # is undefined in cp1252)
    from westa_ocr_spark.kernel.html_extract import decode_html_bytes

    mislabeled = (
        b'<meta charset="windows-1252">'
        + "<p>ctrl \x81 marker</p>".encode("utf-8")
    )
    text, enc = decode_html_bytes(mislabeled)
    assert enc == "utf-8" and "\x81" in text


def test_empty_and_comment_only():
    assert extract_html(b"") == ("", [])
    assert extract_html(b"<!-- nothing -->") == ("", [])


def test_deterministic():
    html = b"<p>stable bytes every run</p>"
    assert extract_html(html) == extract_html(html)


def test_candidate_selection_drops_sidebar():
    # article has ~80% of kept text -> sidebar container dropped even
    # though its link density alone wouldn't kill it
    html = (
        b"<body>"
        b"<article><p>The main story paragraph with plenty of real"
        b" content in it.</p><p>A second long paragraph of the main"
        b" story continues here.</p></article>"
        b"<div><p>short sidebar note</p></div>"
        b"</body>"
    )
    text, spans = extract_html(html)
    assert "sidebar" not in text
    assert text.startswith("The main story")
    assert all(s["tag"] == "p" for s in spans)


def test_candidate_selection_keeps_balanced_page():
    # two containers with similar mass: no dominant candidate -> all kept
    html = (
        b"<body><div><p>first column with the same amount</p></div>"
        b"<div><p>second column with the same amount</p></div></body>"
    )
    text, _ = extract_html(html)
    assert "first column" in text and "second column" in text


def test_undeclared_cp1252_last_resort():
    """Round 5: undeclared legacy pages (no BOM, no meta, invalid
    UTF-8) decode via the WHATWG windows-1252 last resort instead of
    ERRORing — but only when the bytes look like markup; binary junk
    and non-markup text keep the honest ERROR path."""
    from westa_ocr_spark.kernel.html_extract import decode_html_bytes

    doc = "<html><body><p>Fenêtre déjà ouverte</p></body></html>".encode(
        "cp1252"
    )
    text, enc = decode_html_bytes(doc)
    assert enc == "cp1252"
    assert extract_html(doc)[0] == "Fenêtre déjà ouverte"
    for junk in (b"\xff\x00\x01<html>", bytes(range(256)),
                 "plain text caf\xe9".encode("cp1252")):
        with pytest.raises(UnicodeDecodeError):
            decode_html_bytes(junk)


def test_bomless_utf16_sniffed_by_markup_signature():
    """Round 5: BOM-less UTF-16 markup is detected from the
    unambiguous '<\\x00' / '\\x00<' opening signature; odd-length or
    non-markup-leading UTF-16 stays on the ERROR path."""
    from westa_ocr_spark.kernel.html_extract import decode_html_bytes

    doc = "<html><body><p>utf16 no bom ページ</p></body></html>"
    for enc, name in (("utf-16-le", "utf-16-le"), ("utf-16-be",
                                                   "utf-16-be")):
        raw = doc.encode(enc)
        text, got = decode_html_bytes(raw)
        assert got == name and text == doc
        assert extract_html(raw)[0] == "utf16 no bom ページ"
    # odd length (truncated) -> error, not garbage
    with pytest.raises(UnicodeDecodeError):
        decode_html_bytes(doc.encode("utf-16-le")[:-1])
