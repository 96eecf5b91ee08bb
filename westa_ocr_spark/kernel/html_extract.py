"""HTML main-content extraction kernel (pure stdlib, deterministic).

Implements readability/trafilatura-style boilerplate stripping with
DOM-block text-density / link-density scoring, as mandated by the north
rule. This replaces the reference's per-page LLM extraction call
(``/root/reference/app/gemini.py:46-136``) with a deterministic native
function — the reference's own keyless simulation branch
(``/root/reference/app/gemini.py:62-75``) proves the extraction contract
is a pure function of the inputs.

Contract (frozen — fixtures are byte-identical against this):

* input: UTF-8 encoded HTML bytes (strict decode; invalid UTF-8 raises
  ``UnicodeDecodeError`` -> per-row ERROR path, mirroring
  ``/root/reference/app/worker.py:798-823``).
* the document is segmented into *blocks* at block-level element
  boundaries (``p``, ``h1``-``h6``, ``li``, ``div``, ``article``, ...).
* subtrees under chrome/noise tags (``script``, ``style``, ``nav``,
  ``header``, ``footer``, ``aside``, ...) are dropped entirely.
* a block is kept iff it has visible text after whitespace
  normalization AND its link density (non-whitespace chars inside
  ``<a>`` / all non-whitespace chars) is < 0.5.
* readability-style candidate selection: blocks are grouped into
  top-level containers (elements opened directly under the document
  root / a bare ``<body>``); if one container holds >= 60% of the
  surviving text mass it is selected as the main content and all
  other containers are dropped.
* normalization: HTML entities decoded (``html.parser``
  convert_charrefs), every run of Unicode whitespace collapsed to one
  ASCII space, leading/trailing whitespace stripped.
* output text = kept block texts joined by ``"\\n"``, in document
  order; spans are byte offsets into the UTF-8 encoding of the output
  text, with 1-based ``block_id`` (same 1-based contract as the
  reference's page indexing, ``/root/reference/app/pdf_utils.py:29``).
"""

from __future__ import annotations

from html.parser import HTMLParser

# Elements that start a new text block.
BLOCK_TAGS = frozenset(
    (
        "p h1 h2 h3 h4 h5 h6 li pre blockquote article section div main "
        "td th dt dd figcaption caption summary body table tr ul ol dl"
    ).split()
)

# Subtrees dropped entirely (boilerplate / non-content chrome).
DROP_TAGS = frozenset(
    (
        "script style nav header footer aside noscript template form "
        "iframe svg head button select option label object embed title"
    ).split()
)

# Void elements rendered as whitespace.
_VOID_SPACE = frozenset({"br", "hr", "img"})

MAX_LINK_DENSITY = 0.5

# candidate selection: a container must hold this share of all kept
# text to be declared THE main content
CANDIDATE_SHARE = 0.6


class _Block:
    __slots__ = ("tag", "parts", "anchor_chars", "total_chars",
                 "container")

    def __init__(self, tag: str, container: int) -> None:
        self.tag = tag
        self.parts: list[str] = []
        self.anchor_chars = 0
        self.total_chars = 0
        self.container = container


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._cur: _Block | None = None
        self._drop_depth = 0
        self._anchor_depth = 0
        self._block_stack: list[str] = []
        # candidate-selection containers: a new container starts at
        # each block element opened directly under the document root
        # (an empty stack or a bare <body>)
        self._container_seq = 0
        self._stray_seq = 0

    # html.parser tracks (lineno, offset) for error messages we never
    # read; updatepos is ~9% of kernel time under profile. Neutering
    # it cannot change tokenization — it only feeds self.lineno/offset.
    def updatepos(self, i, j):  # noqa: ANN001
        return j

    # -- block bookkeeping -------------------------------------------------
    def _flush(self) -> None:
        if self._cur is not None and self._cur.total_chars:
            self.blocks.append(self._cur)
        self._cur = None

    # -- parser callbacks ---------------------------------------------------
    def handle_starttag(self, tag, attrs):  # noqa: ANN001
        if tag in DROP_TAGS:
            self._flush()
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._anchor_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()
            if not self._block_stack or self._block_stack == ["body"]:
                self._container_seq += 1
            self._block_stack.append(tag)
            self._cur = _Block(tag, self._container_seq)
        elif tag in _VOID_SPACE and self._cur is not None:
            self._cur.parts.append(" ")

    def handle_startendtag(self, tag, attrs):  # noqa: ANN001
        if self._drop_depth:
            return
        if tag in _VOID_SPACE and self._cur is not None:
            self._cur.parts.append(" ")

    def handle_endtag(self, tag):  # noqa: ANN001
        if tag in DROP_TAGS:
            if self._drop_depth:
                self._drop_depth -= 1
            return
        if self._drop_depth:
            return
        if tag == "a" and self._anchor_depth:
            self._anchor_depth -= 1
        if tag in BLOCK_TAGS:
            self._flush()
            if tag in self._block_stack:
                while self._block_stack and self._block_stack.pop() != tag:
                    pass
            # text following a closed child block resumes in a fresh block
            # attributed to the nearest still-open block ancestor.
            if self._block_stack:
                self._cur = _Block(self._block_stack[-1],
                                   self._container_seq)

    def handle_data(self, data):  # noqa: ANN001
        if self._drop_depth or not data:
            return
        if self._cur is None:
            # stray text outside any block element: isolated container
            # (negative ids so it never merges with real containers)
            self._stray_seq -= 1
            self._cur = _Block("body", self._stray_seq)
        self._cur.parts.append(data)
        # non-whitespace char count; str.split() uses the same Unicode
        # whitespace set as str.isspace(), and runs at C speed (the
        # per-char generator version was half the kernel's runtime)
        nw = len("".join(data.split()))
        if nw:
            self._cur.total_chars += nw
            if self._anchor_depth:
                self._cur.anchor_chars += nw

    def finish(self) -> None:
        self.close()
        self._flush()


def extract_html(html_bytes: bytes) -> tuple[str, list[dict]]:
    """Extract main content text + block spans from raw HTML bytes.

    Returns ``(text, spans)`` where spans is a list of dicts
    ``{block_id (1-based), start, end (byte offsets into UTF-8 text),
    tag}``. Raises on undecodable input (per-row ERROR path upstream).
    """
    text = html_bytes.decode("utf-8")  # strict: malformed bytes -> error row
    parser = _Extractor()
    parser.feed(text)
    parser.finish()

    kept: list[tuple[str, str, int, int]] = []
    for block in parser.blocks:
        norm = " ".join("".join(block.parts).split())
        if not norm:
            continue
        density = (
            block.anchor_chars / block.total_chars if block.total_chars else 1.0
        )
        if density >= MAX_LINK_DENSITY:
            continue
        kept.append((block.tag, norm, block.container, block.total_chars))

    # readability-style candidate selection: score each top-level
    # container by its surviving text mass; when one container clearly
    # dominates (>= CANDIDATE_SHARE of all kept text), it is the main
    # content and everything outside it (sidebars, related-links
    # blocks, stray inter-container text) is dropped. Ambiguous pages
    # (no dominant container) keep all low-link-density blocks.
    totals: dict[int, int] = {}
    for _, _, container, chars in kept:
        totals[container] = totals.get(container, 0) + chars
    if len(totals) > 1:
        grand = sum(totals.values())
        best = max(totals, key=lambda c: (totals[c], -c))
        if totals[best] >= CANDIDATE_SHARE * grand:
            kept = [k for k in kept if k[2] == best]

    out_parts: list[str] = []
    spans: list[dict] = []
    offset = 0
    for block_id, (tag, norm, _, _) in enumerate(kept, start=1):
        nbytes = len(norm.encode("utf-8"))
        out_parts.append(norm)
        spans.append(
            {
                "block_id": block_id,
                "start": offset,
                "end": offset + nbytes,
                "tag": tag,
            }
        )
        offset += nbytes + 1  # +1 for the '\n' joiner
    return "\n".join(out_parts), spans
