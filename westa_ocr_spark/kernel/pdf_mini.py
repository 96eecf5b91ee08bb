"""Minimal PDF writer + page-split/text parser (pure stdlib).

The reference splits PDFs into one payload per page with 1-based
indices and a fixed mime type (``/root/reference/app/pdf_utils.py:23-36``)
using pypdf. pypdf is not available in this environment, so the synthetic
corpus (FIXTURES.md §1.2) is written by :func:`write_pdf` — a minimal,
uncompressed PDF 1.4 serializer — and parsed back by
:func:`extract_pdf_pages`, which honors the same contracts:

* pages are enumerated in ``/Kids`` order with 1-based indices
  (``/root/reference/app/pdf_utils.py:29``);
* a non-PDF or truncated byte stream raises ``ValueError`` -> per-row
  ERROR path (``/root/reference/app/worker.py:798-823``).

Text model: each page's content stream holds one ``(line) Tj`` show-text
operator per line; the parser re-joins lines with ``"\\n"``. Only the
PDF string escapes ``\\\\ \\( \\)`` and octal escapes are supported —
enough for a deterministic, byte-identical round trip.
"""

from __future__ import annotations

import re

_ESCAPES = {"\\": "\\\\", "(": "\\(", ")": "\\)"}


def _esc(line: str) -> str:
    return "".join(_ESCAPES.get(ch, ch) for ch in line)


def _unesc(raw: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(raw):
        ch = raw[i]
        if ch == "\\" and i + 1 < len(raw):
            nxt = raw[i + 1]
            if nxt in "\\()":
                out.append(nxt)
                i += 2
                continue
            if nxt.isdigit():  # octal escape \ddd
                j = i + 1
                while j < len(raw) and j < i + 4 and raw[j].isdigit():
                    j += 1
                out.append(chr(int(raw[i + 1 : j], 8)))
                i = j
                continue
        out.append(ch)
        i += 1
    return "".join(out)


def write_pdf(pages: list[str]) -> bytes:
    """Serialize a list of page texts into a minimal valid PDF.

    Text is encoded latin-1-escaped (non-latin-1 chars become octal
    escapes of their UTF-8 bytes so the round trip is byte-exact at the
    UTF-8 level).
    """
    n = len(pages)
    objects: list[bytes] = []

    # obj 1: catalog, obj 2: pages, obj 3: font,
    # obj 4+2i: page i, obj 5+2i: content stream i
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode("latin-1")
    )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    for i, page_text in enumerate(pages):
        lines = page_text.split("\n")
        ops = ["BT /F1 12 Tf 72 720 Td"]
        for k, line in enumerate(lines):
            if k:
                ops.append("0 -14 Td")
            # escape PDF specials, then octal-escape non-latin-1 via UTF-8
            esc = _esc(line)
            enc = "".join(
                ch
                if ord(ch) < 128
                else "".join(f"\\{b:03o}" for b in ch.encode("utf-8"))
                for ch in esc
            )
            ops.append(f"({enc}) Tj")
        ops.append("ET")
        stream = " ".join(ops).encode("latin-1")
        objects.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {5 + 2 * i} 0 R "
            f"/Resources << /Font << /F1 3 0 R >> >> >>".encode("latin-1")
        )
        objects.append(
            f"<< /Length {len(stream)} >>\nstream\n".encode("latin-1")
            + stream
            + b"\nendstream"
        )

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += f"{num} 0 obj\n".encode("latin-1") + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += f"xref\n0 {len(objects) + 1}\n".encode("latin-1")
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += f"{off:010d} 00000 n \n".encode("latin-1")
    buf += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode("latin-1")
    return bytes(buf)


_OBJ_RE = re.compile(rb"(\d+) 0 obj\s*(.*?)\s*endobj", re.S)
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.S)
_REF_RE = re.compile(rb"(\d+) 0 R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+) 0 R")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj")


def split_pdf(data: bytes) -> list[bytes]:
    """Split a PDF into standalone one-page PDFs, in page order.

    1:1 with the reference's ``split_pdf``
    (``/root/reference/app/pdf_utils.py:23-36``): each page is
    re-serialized as an independent single-page document; the caller
    pairs each with a 1-based index and ``application/pdf`` mime.
    Implemented by re-serializing each page's extracted text through
    the same writer, so the per-page byte streams are deterministic
    and parse back to identical text.
    """
    return [write_pdf([page]) for page in extract_pdf_pages(data)]


def extract_pdf_pages(data: bytes) -> list[str]:
    """Split PDF bytes into per-page extracted text, in page order.

    Returns a list of page texts; the caller assigns 1-based
    ``page_index`` by position (reference contract:
    ``/root/reference/app/pdf_utils.py:29``). Raises ``ValueError`` for
    non-PDF or truncated input.
    """
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF byte stream (missing %PDF- magic)")
    if b"%%EOF" not in data:
        raise ValueError("truncated PDF (missing %%EOF)")

    objs = {m.group(1): m.group(2) for m in _OBJ_RE.finditer(data)}
    kids: list[bytes] | None = None
    for body in objs.values():
        if b"/Type /Pages" in body or b"/Type/Pages" in body:
            m = _KIDS_RE.search(body)
            if m:
                kids = [r.group(1) for r in _REF_RE.finditer(m.group(1))]
            break
    if not kids:
        raise ValueError("malformed PDF (no /Pages /Kids)")

    pages: list[str] = []
    for kid in kids:
        page_obj = objs.get(kid)
        if page_obj is None:
            raise ValueError("malformed PDF (dangling page ref)")
        cm = _CONTENTS_RE.search(page_obj)
        if cm is None:
            raise ValueError("malformed PDF (page without /Contents)")
        content = objs.get(cm.group(1))
        if content is None:
            raise ValueError("malformed PDF (dangling contents ref)")
        sm = _STREAM_RE.search(content)
        if sm is None:
            raise ValueError("malformed PDF (contents without stream)")
        lines = [
            _unesc(m.group(1).decode("latin-1"))
            for m in _TJ_RE.finditer(sm.group(1))
        ]
        # lines whose chars came from octal-escaped UTF-8 bytes decode here
        page = "\n".join(
            line.encode("latin-1").decode("utf-8", errors="strict")
            for line in lines
        )
        pages.append(page)
    return pages
