"""Real (uncompressed) PDF text-showing parser — the PDF-kind
counterpart of the WAV/PPM proofs (``functions/wav.py``, ``ppm.py``) for
the extraction pipeline's layout path (``operators/extract.py``).

The container ships no PDF libraries, but an UNCOMPRESSED PDF is plain
bytes: object dictionaries, content streams, and a postfix text operator
language — all parseable with ``re`` and a small operand scanner.  So
this module is REAL decode logic: header validation, object collection,
page/Kids walking, stream extraction (rejecting filtered/compressed
streams), and a content interpreter tracking the text position through
``BT``/``Tm``/``Td``/``TD`` and emitting ``Tj``/``TJ`` shown strings with
escape handling.  Only the byte FETCH is synthesized:
``synth_pdf_bytes`` builds a deterministic multi-page PDF (correct xref
offsets included) from a token list, which gives the parser a
closed-form oracle — the synthesized layout coordinates are index
functions, so the oracle predicts the reading order without touching
bytes, while the engine only gets it right by actually interpreting the
content stream it fetched.

Known minimal-parser limits (documented, not silent): only literal
``(...)`` strings (no hex ``<...>``), no font-width advance after a show
(the synthesizer positions every show explicitly), and any /Filter'd
stream raises instead of decoding garbage.
"""

from __future__ import annotations

import re

# layout grid used by the synthesizer — index functions a SQL oracle can
# reproduce: token i sits on page 1 + i//8 at y = 700 - 20*((3i) mod 4),
# x = 50 + 10i
TOKENS_PER_PAGE = 8


def _coords(i: int) -> tuple[int, float, float]:
    page = 1 + i // TOKENS_PER_PAGE
    y = 700.0 - 20.0 * ((3 * i) % 4)
    x = 50.0 + 10.0 * i
    return page, y, x


def _escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def synth_pdf_bytes(tokens: list[str]) -> bytes:
    """Deterministic uncompressed PDF placing ``tokens[i]`` at
    ``_coords(i)``.  Each page is one BT block whose FIRST show is
    positioned absolutely (``Tm``) and every later one RELATIVELY
    (``Td`` deltas) — a parser that ignores the matrix state reads wrong
    coordinates.  Shows alternate ``Tj`` and ``TJ`` (with a kerning
    number the parser must skip).  The xref table carries correct byte
    offsets."""
    pages: dict[int, list[tuple[float, float, str]]] = {}
    for i, tok in enumerate(tokens):
        page, y, x = _coords(i)
        pages.setdefault(page, []).append((y, x, tok))

    n_pages = max(pages) if pages else 1
    # object numbering: 1 catalog, 2 pages, then per page: page obj,
    # content obj
    page_obj = {p: 3 + 2 * (p - 1) for p in range(1, n_pages + 1)}
    content_obj = {p: page_obj[p] + 1 for p in range(1, n_pages + 1)}

    objects: list[tuple[int, bytes]] = []
    kids = " ".join(f"{page_obj[p]} 0 R" for p in range(1, n_pages + 1))
    objects.append((1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    objects.append(
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    )
    for p in range(1, n_pages + 1):
        objects.append(
            (
                page_obj[p],
                (
                    f"<< /Type /Page /Parent 2 0 R "
                    f"/MediaBox [0 0 612 792] "
                    f"/Contents {content_obj[p]} 0 R >>"
                ).encode(),
            )
        )
        ops = ["BT", "/F1 12 Tf"]
        prev = None
        for j, (y, x, tok) in enumerate(pages.get(p, [])):
            if prev is None:
                ops.append(f"1 0 0 1 {x:g} {y:g} Tm")
            else:
                ops.append(f"{x - prev[1]:g} {y - prev[0]:g} Td")
            if j % 2 == 0:
                ops.append(f"({_escape(tok)}) Tj")
            else:
                ops.append(f"[({_escape(tok)}) -250] TJ")
            prev = (y, x)
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1")
        body = (
            f"<< /Length {len(stream)} >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )
        objects.append((content_obj[p], body))

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num, body in objects:
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    n_obj = max(offsets) + 1
    out += f"xref\n0 {n_obj}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n_obj):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n_obj} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_NUM_RE = re.compile(rb"[+-]?\d*\.?\d+")


def _parse_string(data: bytes, pos: int) -> tuple[str, int]:
    """Literal PDF string starting at ``data[pos] == '('``; handles
    ``\\``-escapes and balanced nested parens.  Returns (text, next)."""
    assert data[pos:pos + 1] == b"("
    out = []
    depth = 1
    i = pos + 1
    esc = {b"n": "\n", b"r": "\r", b"t": "\t", b"(": "(", b")": ")",
           b"\\": "\\"}
    while i < len(data):
        c = data[i:i + 1]
        if c == b"\\":
            nxt = data[i + 1:i + 2]
            out.append(esc.get(nxt, nxt.decode("latin-1")))
            i += 2
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
        out.append(c.decode("latin-1"))
        i += 1
    raise ValueError("unterminated PDF string")


def _interpret_stream(
    content: bytes, page: int
) -> list[tuple[int, float, float, str]]:
    """Walk one content stream's text operators, tracking the text
    position: ``Tm`` sets it absolutely (e, f), ``Td``/``TD`` translate
    it, ``BT`` resets; ``Tj`` shows the last string operand, ``TJ``
    concatenates the strings of the last array (skipping kerning
    numbers)."""
    rows: list[tuple[int, float, float, str]] = []
    operands: list = []
    x = y = 0.0
    i = 0
    n = len(content)
    while i < n:
        c = content[i:i + 1]
        if c in b" \t\r\n":
            i += 1
        elif c == b"(":
            s, i = _parse_string(content, i)
            operands.append(s)
        elif c == b"[":
            j = i + 1
            arr: list = []
            while j < n and content[j:j + 1] != b"]":
                cj = content[j:j + 1]
                if cj == b"(":
                    s, j = _parse_string(content, j)
                    arr.append(s)
                elif m := _NUM_RE.match(content, j):
                    arr.append(float(m.group()))
                    j = m.end()
                else:
                    j += 1
            operands.append(arr)
            i = j + 1
        elif c == b"/":
            m = re.match(rb"/\w*", content[i:])
            operands.append(m.group().decode("latin-1"))
            i += m.end()
        elif m := _NUM_RE.match(content, i):
            operands.append(float(m.group()))
            i = m.end()
        else:
            m = re.match(rb"[A-Za-z'\"*]+", content[i:])
            if not m:
                i += 1
                continue
            op = m.group().decode("latin-1")
            i += m.end()
            if op == "BT":
                x = y = 0.0
            elif op == "Tm" and len(operands) >= 6:
                x, y = float(operands[-2]), float(operands[-1])
            elif op in ("Td", "TD") and len(operands) >= 2:
                x += float(operands[-2])
                y += float(operands[-1])
            elif op == "Tj" and operands:
                if isinstance(operands[-1], str):
                    rows.append((page, y, x, operands[-1]))
            elif op == "TJ" and operands:
                if isinstance(operands[-1], list):
                    txt = "".join(
                        s for s in operands[-1] if isinstance(s, str)
                    )
                    rows.append((page, y, x, txt))
            operands = []
    return rows


def parse_pdf_text(payload: bytes) -> list[tuple[int, float, float, str]]:
    """Minimal REAL uncompressed-PDF text extractor: validates the
    header, collects objects, walks Pages→Kids→Contents, extracts each
    page's stream (raising on /Filter — no decompression libs here), and
    interprets the text operators.  Returns (page, y, x, text) rows in
    stream order."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload (missing %PDF- header)")
    objects = {
        int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(payload)
    }
    if not objects:
        raise ValueError("no PDF objects found")
    # page order from the Pages object's /Kids; fall back to doc order
    kid_nums: list[int] = []
    for body in objects.values():
        if b"/Type /Pages" in body or b"/Type/Pages" in body:
            kids = re.search(rb"/Kids\s*\[(.*?)\]", body, re.S)
            if kids:
                kid_nums = [
                    int(g) for g in re.findall(rb"(\d+)\s+0\s+R",
                                               kids.group(1))
                ]
            break
    if not kid_nums:
        kid_nums = [
            num for num, body in sorted(objects.items())
            if b"/Type /Page" in body and b"/Pages" not in body
        ]
    if not kid_nums:
        raise ValueError("no /Page objects found")
    rows: list[tuple[int, float, float, str]] = []
    for page_idx, num in enumerate(kid_nums, start=1):
        body = objects.get(num)
        if body is None:
            raise ValueError(f"missing page object {num}")
        cref = re.search(rb"/Contents\s+(\d+)\s+0\s+R", body)
        if not cref:
            continue  # empty page
        cbody = objects.get(int(cref.group(1)))
        if cbody is None:
            raise ValueError(f"missing content object {cref.group(1)!r}")
        head, _, _ = cbody.partition(b"stream")
        if b"/Filter" in head:
            raise ValueError(
                "compressed/filtered PDF streams are not supported "
                "(no decompression libraries in this environment)"
            )
        sm = _STREAM_RE.search(cbody)
        if not sm:
            raise ValueError(f"page {page_idx}: no stream in content obj")
        rows.extend(_interpret_stream(sm.group(1), page_idx))
    return rows


def pdf_layout_text(payload: bytes) -> str:
    """Reading-order text of an uncompressed PDF: parse, sort by
    (page, y DESCENDING — PDF y grows upward, x ascending), join."""
    rows = parse_pdf_text(payload)
    rows.sort(key=lambda r: (r[0], -r[1], r[2]))
    return " ".join(r[3] for r in rows if r[3])
