"""Property-based kernel tests (hypothesis): the contracts hold for
arbitrary inputs, not just the seeded corpus."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from westa_ocr_spark.kernel.html_extract import extract_html
from westa_ocr_spark.kernel.pdf_mini import extract_pdf_pages, write_pdf

# text without the PDF-hostile control chars we never emit
pdf_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\r"
    ),
    max_size=300,
)


@settings(max_examples=150, deadline=None)
@given(st.lists(pdf_text, min_size=1, max_size=5))
def test_pdf_roundtrip_arbitrary_text(pages):
    assert extract_pdf_pages(write_pdf(pages)) == pages


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2000))
def test_html_extract_total_on_arbitrary_bytes(data):
    """extract_html either returns (text, spans) or raises the two
    documented error types — never crashes another way, never
    desyncs spans."""
    try:
        text, spans = extract_html(data)
    except (UnicodeDecodeError, ValueError):
        # undecodable bytes, or a malformed marked section (round 4:
        # stdlib's AssertionError normalized to ValueError)
        return
    raw = text.encode("utf-8")
    for s in spans:
        seg = raw[s["start"] : s["end"]]
        seg.decode("utf-8")  # offsets always hit char boundaries
    assert len(spans) == 0 or spans[-1]["end"] == len(raw)
    assert [s["block_id"] for s in spans] == list(
        range(1, len(spans) + 1)
    )


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=2000))
def test_html_extract_deterministic(txt):
    data = txt.encode("utf-8")
    assert extract_html(data) == extract_html(data)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="ab <>/ph1div", max_size=300))
def test_html_spans_reconstruct_text(soup):
    """joining span segments with newlines reproduces the text."""
    text, spans = extract_html(soup.encode("utf-8"))
    raw = text.encode("utf-8")
    parts = [raw[s["start"]: s["end"]].decode("utf-8") for s in spans]
    assert "\n".join(parts) == text


@settings(max_examples=60, deadline=None)
@given(
    st.lists(pdf_text, min_size=1, max_size=4),
    st.sampled_from(
        [
            {"compress": True},
            {"tj_arrays": True},
            {"compress": True, "tj_arrays": True},
            {"objstm": True},
            {"objstm": True, "tj_arrays": True},
        ]
    ),
)
def test_pdf_roundtrip_all_dialects(pages, kw):
    """Round 2: every writer dialect (FlateDecode, TJ arrays,
    object-stream/xref-stream) round-trips arbitrary text."""
    assert extract_pdf_pages(write_pdf(pages, **kw)) == pages


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=3000))
def test_pdf_parser_total_on_arbitrary_bytes(data):
    """The tolerant loader never crashes with anything but ValueError
    on arbitrary garbage prefixed to look like a PDF."""
    try:
        pages = extract_pdf_pages(b"%PDF-1.4\n" + data + b"\n%%EOF\n")
        assert isinstance(pages, list)
        assert all(isinstance(p, str) for p in pages)
    except ValueError:
        pass


@settings(max_examples=80, deadline=None)
@given(
    st.lists(pdf_text, min_size=1, max_size=3),
    st.integers(min_value=0, max_value=10_000),
    st.binary(min_size=1, max_size=12),
)
def test_pdf_parser_total_under_mutation(pages, pos, junk):
    """Corrupting a valid compressed PDF anywhere yields either a
    clean parse or ValueError — never another exception type."""
    pdf = bytearray(write_pdf(pages, compress=True))
    at = pos % len(pdf)
    mutated = bytes(pdf[:at]) + junk + bytes(pdf[at:])
    if not mutated.startswith(b"%PDF-"):
        mutated = b"%PDF-1.4\n" + mutated
    try:
        out = extract_pdf_pages(mutated)
        assert isinstance(out, list)
    except ValueError:
        pass


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2000))
def test_warc_parser_total_on_arbitrary_bytes(data):
    """parse_warc never crashes with anything but ValueError."""
    from westa_ocr_spark.sources.warc import parse_warc

    for payload in (data, b"WARC/1.0\r\n" + data,
                    b"\x1f\x8b" + data):
        try:
            recs = parse_warc(payload)
            assert isinstance(recs, list)
        except ValueError:
            pass


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet=st.characters(
                min_codepoint=33, max_codepoint=126), min_size=1,
                max_size=40),
            st.binary(max_size=400),
        ),
        min_size=1,
        max_size=5,
    ),
    st.booleans(),
)
def test_warc_roundtrip_arbitrary_payloads(items, gz):
    from westa_ocr_spark.sources.warc import parse_warc, write_warc

    recs = [
        {"url": f"https://x.example/{u}", "date": "2025-01-01T00:00:00Z",
         "html": b}
        for u, b in items
    ]
    parsed = parse_warc(write_warc(recs, gzip_members=gz))
    assert [r["payload"] for r in parsed] == [r["html"] for r in recs]
    assert [r["url"] for r in parsed] == [r["url"] for r in recs]


_MARKUP_SOUP = st.text(
    alphabet="ab c<>/=\"'&;!?-[]pdivscrptyle\n\t#x0123",
    max_size=400,
)


@settings(max_examples=400, deadline=None)
@given(_MARKUP_SOUP)
def test_fast_tokenizer_equivalent_to_stdlib(soup):
    """Round 4: the fast tokenizer must produce byte-identical
    (text, spans) to the html.parser reference path on adversarial
    markup soup — quotes, entities, comments, PIs, marked sections,
    script/style cdata, bogus tags. The stdlib path is the arbiter."""
    data = soup.encode("utf-8")

    def run(which):
        try:
            return extract_html(data, tokenizer=which)
        except ValueError as exc:
            return ("VALUE_ERROR", str(exc))

    assert run("fast") == run("stdlib")


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=1500))
def test_fast_tokenizer_equivalent_on_plain_text(soup):
    data = soup.encode("utf-8")

    def run(which):
        try:
            return extract_html(data, tokenizer=which)
        except ValueError as exc:
            return ("VALUE_ERROR", str(exc))

    assert run("fast") == run("stdlib")


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2000),
       st.sampled_from([None, "utf-8", "shift_jis", "euc-kr", "gb2312",
                        "latin-1", "utf-16", "x-bogus"]))
def test_charset_decode_total_and_deterministic(data, hint):
    """decode_html_bytes is total (returns or raises exactly
    UnicodeDecodeError), deterministic, and its reported codec really
    is a codec that the returned text is consistent with."""
    import codecs

    from westa_ocr_spark.kernel.html_extract import decode_html_bytes

    try:
        text, enc = decode_html_bytes(data, hint)
    except UnicodeDecodeError:
        with pytest.raises(UnicodeDecodeError):
            decode_html_bytes(data, hint)  # raises deterministically
        return
    # deterministic
    assert decode_html_bytes(data, hint) == (text, enc)
    # the reported codec exists
    codecs.lookup(enc)
    assert isinstance(text, str)


@settings(max_examples=120, deadline=None)
@given(st.text(alphabet=st.characters(codec="cp932"), max_size=200),
       st.sampled_from(["Shift_JIS", "shift-jis", "SJIS", "x-sjis"]))
def test_charset_declared_roundtrip(body, label):
    """Any cp932-encodable body declared under any Shift_JIS alias
    decodes back to the exact original text."""
    from westa_ocr_spark.kernel.html_extract import decode_html_bytes

    doc = f'<meta charset="{label}"><p>{body}</p>'
    raw = doc.encode("cp932", errors="ignore")
    text, enc = decode_html_bytes(raw)
    assert text == raw.decode("cp932")
    assert enc == "cp932"


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=800))
def test_gif_decoder_total(data):
    """decode_gif_pixels raises ONLY ValueError on arbitrary bytes
    (round-5 fuzz found struct.error/IndexError escapes on truncated
    descriptors / color tables / missing LZW code size)."""
    from westa_ocr_spark.operators.multimodal import decode_gif_pixels

    try:
        decode_gif_pixels(b"GIF89a" + data)
    except ValueError:
        pass


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 10**9), st.integers(0, 255), st.integers(0, 10**9))
def test_png_gif_mutation_total(pos, val, seed):
    """Single-byte corruption of REAL png/gif files (incl. interlaced
    and local-palette layouts) either decodes or raises ValueError —
    round-5 fuzz found corrupt IDAT escaping as zlib.error."""
    from westa_ocr_spark.operators.multimodal import (
        decode_gif_pixels,
        decode_png_pixels,
        write_gif,
        write_png,
    )

    png = bytearray(write_png(9 + seed % 8, 7 + seed % 5,
                              interlace=bool(seed % 2)))
    png[pos % len(png)] = val
    try:
        decode_png_pixels(bytes(png))
    except ValueError:
        pass
    gif = bytearray(write_gif(9 + seed % 8, 7 + seed % 5,
                              interlace=bool(seed % 2),
                              local_palette=seed % 3 == 0))
    gif[pos % len(gif)] = val
    try:
        decode_gif_pixels(bytes(gif))
    except ValueError:
        pass


@settings(max_examples=400, deadline=None)
@given(st.integers(0, 10**9), st.integers(0, 255), st.integers(0, 4))
def test_jpeg_mutation_total(pos, val, which):
    """Single-byte corruption of real baseline/progressive color
    JPEGs (all subsamplings + restarts) raises ONLY ValueError —
    round-5 fuzz found DHT count/value mismatches, truncated SOF/SOS
    headers, out-of-range DC categories (unbounded predictors) and
    double-SOF grid re-dimensioning escaping as
    IndexError/OverflowError/struct.error."""
    import numpy as np

    from westa_ocr_spark.kernel.jpeg_mini import (
        decode_jpeg,
        write_jpeg_color,
        write_jpeg_progressive,
    )

    yy, xx = np.mgrid[0:24, 0:40]
    rgb = np.stack(
        [np.clip(yy * 3 + 16, 0, 255), np.clip(xx * 2 + 32, 0, 255),
         np.clip(xx + yy + 64, 0, 255)], axis=2
    ).astype(np.uint8)
    bases = [write_jpeg_color(rgb, s) for s in ("420", "422", "444")]
    bases.append(write_jpeg_color(rgb, "420", restart_interval=2))
    bases.append(write_jpeg_progressive(rgb, "420"))
    base = bytearray(bases[which])
    base[pos % len(base)] = val
    try:
        decode_jpeg(bytes(base))
    except ValueError:
        pass


def test_jpeg_sos_zero_components_is_valueerror():
    """Round-6 fuzz regression (pinned deterministically because the
    hypothesis example DB is gitignored): a corrupted SOS whose Ns
    byte reads 0 left scan_comps empty and index-crashed the
    non-interleaved scan path; T.81 B.2.3 bounds 1 <= Ns <= 4."""
    import numpy as np
    import pytest

    from westa_ocr_spark.kernel.jpeg_mini import (
        decode_jpeg,
        write_jpeg_color,
    )

    yy, xx = np.mgrid[0:24, 0:40]
    rgb = np.stack(
        [np.clip(yy * 3 + 16, 0, 255), np.clip(xx * 2 + 32, 0, 255),
         np.clip(xx + yy + 64, 0, 255)], axis=2
    ).astype(np.uint8)
    buf = bytearray(write_jpeg_color(rgb, "420"))
    # find the SOS marker and zero its Ns byte (first header byte)
    sos = buf.find(b"\xff\xda")
    assert sos >= 0
    buf[sos + 4] = 0
    with pytest.raises(ValueError, match="jpeg: "):
        decode_jpeg(bytes(buf))
