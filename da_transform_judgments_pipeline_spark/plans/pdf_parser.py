"""A REAL PDF text extractor: PDF 1.4 bytes → text + metadata, stdlib-only.

The reference's parser step consumes court judgments as Office documents
(lambda_functions/tre-run-judgment-parser — see ``docx_parser``); a
training-data corpus at scale is PDF-heavy, so this module gives the
engine the same encode→parse loop for the other dominant document
format, built from public knowledge only (the PDF 1.4 spec / ISO 32000):

- a classic cross-reference **table** is parsed from ``startxref`` back
  through ``/Prev`` chains; objects are loaded lazily by byte offset
  (no full-file regex scan — the 100 TB posture is "seek, don't scan");
- a small recursive-descent **COS lexer** covers dictionaries, arrays,
  names (with ``#xx`` escapes), literal strings (nested parens, all
  escape forms, octal), hex strings, numbers, booleans, null, indirect
  references and ``stream``/``endstream`` (via the resolved ``/Length``);
- the page tree is walked Catalog → ``/Pages`` → ``/Kids`` (nested
  ``/Pages`` nodes supported) in document order; ``/Contents`` may be a
  single stream or an array;
- content streams are decoded (``/FlateDecode`` via ``zlib`` with the
  same actual-bytes bomb bounds as ``docx_parser``; no filter = raw;
  any other filter is a typed refusal naming it) and text is extracted
  from ``BT``/``ET`` blocks: ``Tj``, ``'``, ``"``, ``TJ`` show
  operators, with ``Td``/``TD``/``T*``/``Tm`` vertical motion starting
  a new line — the deterministic subset every real extractor agrees on;
- PDF 1.5 cross-reference **streams** and object streams are typed
  refusals (named in the error), not silent misparses.

:func:`build_pdf` is the deterministic encoder twin (the
``docx_parser.build_docx`` / ``audiocodec.encode_wav`` pattern): it
assembles a real, viewer-readable PDF 1.4 file — correct xref offsets,
optional Flate-compressed content streams, optional ``TJ`` kerning
arrays, optional raw image XObjects — pinned byte-for-byte so closed-form
oracles can recompute every extracted field.
"""

from __future__ import annotations

import re
import zlib

# Decompression bounds (the docx_parser DOCX_MAX_* pattern): checked
# against ACTUAL produced bytes during inflate — a hostile /Length or
# deflate body can lie small.
PDF_MAX_STREAM_BYTES = 64 << 20
PDF_MAX_TOTAL_BYTES = 512 << 20

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

_CITE_RE = re.compile(
    r"\[(\d{4})\]\s+(UKSC|UKPC|EWCA|EWHC|EWCOP|EWFC|UKUT|UKEAT|UKFTT)"
    r"(?:\s+(Civ|Crim|Admin|Ch|QB|KB|Fam|Pat|Comm|TCC|IPEC|SCCO|AAC|"
    r"IAC|LC|TCC?))?\s+(\d+)"
)


class PdfError(ValueError):
    """Malformed or unsupported PDF — typed so ``parse_pdfs`` report mode
    can isolate the row with the real reason."""


class PdfBombError(PdfError):
    """A stream inflated past PDF_MAX_STREAM_BYTES / PDF_MAX_TOTAL_BYTES."""


class _Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num, self.gen = num, gen

    def __repr__(self):  # pragma: no cover - debug aid
        return f"{self.num} {self.gen} R"


class _Name(str):
    """PDF name object — distinct from string values."""


class _Stream:
    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.dict, self.raw = d, raw


class _Lexer:
    """Token/object reader over the raw PDF bytes at a movable position."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to end of line
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def _word(self) -> bytes:
        self._skip_ws()
        d, n, start = self.data, len(self.data), self.pos
        while self.pos < n and d[self.pos] not in _WS and (
            d[self.pos] not in _DELIM
        ):
            self.pos += 1
        return d[start:self.pos]

    def _name(self) -> _Name:
        # caller consumed '/'
        d, n, start = self.data, len(self.data), self.pos
        while self.pos < n and d[self.pos] not in _WS and (
            d[self.pos] not in _DELIM
        ):
            self.pos += 1
        raw = d[start:self.pos]
        if b"#" in raw:
            out = bytearray()
            i = 0
            while i < len(raw):
                if raw[i] == 0x23 and i + 2 < len(raw):
                    out.append(int(raw[i + 1:i + 3], 16))
                    i += 3
                else:
                    out.append(raw[i])
                    i += 1
            raw = bytes(out)
        return _Name(raw.decode("latin-1"))

    def _literal_string(self) -> bytes:
        # caller consumed '('
        d, n = self.data, len(self.data)
        out, depth = bytearray(), 1
        while self.pos < n:
            c = d[self.pos]
            self.pos += 1
            if c == 0x5C:  # backslash
                if self.pos >= n:
                    break
                e = d[self.pos]
                self.pos += 1
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                                0x62: 8, 0x66: 12}[e])
                elif e in b"()\\":
                    out.append(e)
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    val = e - 0x30
                    for _ in range(2):
                        if self.pos < n and 0x30 <= d[self.pos] <= 0x37:
                            val = val * 8 + (d[self.pos] - 0x30)
                            self.pos += 1
                    out.append(val & 0xFF)
                elif e in b"\r\n":  # line continuation
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
            elif c == 0x28:
                depth += 1
                out.append(c)
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
        raise PdfError("unterminated literal string")

    def _hex_string(self) -> bytes:
        # caller consumed '<'
        d, n = self.data, len(self.data)
        digits = bytearray()
        while self.pos < n:
            c = d[self.pos]
            self.pos += 1
            if c == 0x3E:  # '>'
                if len(digits) % 2:
                    digits.append(0x30)
                return bytes.fromhex(digits.decode("ascii"))
            if c in _WS:
                continue
            digits.append(c)
        raise PdfError("unterminated hex string")

    def read_object(self):
        """Read one COS object at the current position."""
        self._skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            raise PdfError("unexpected end of data")
        c = d[self.pos]
        if c == 0x2F:  # /name
            self.pos += 1
            return self._name()
        if c == 0x28:  # (string)
            self.pos += 1
            return self._literal_string()
        if c == 0x3C:  # << dict or <hex>
            if d[self.pos:self.pos + 2] == b"<<":
                self.pos += 2
                return self._dict_or_stream()
            self.pos += 1
            return self._hex_string()
        if c == 0x5B:  # [ array
            self.pos += 1
            arr = []
            while True:
                self._skip_ws()
                if self.pos < n and d[self.pos] == 0x5D:
                    self.pos += 1
                    return arr
                arr.append(self.read_object())
        if c == 0x5D or c == 0x3E:
            raise PdfError(f"unexpected delimiter {chr(c)!r}")
        word = self._word()
        if not word:
            raise PdfError(f"cannot lex byte {d[self.pos]!r} at {self.pos}")
        if word == b"true":
            return True
        if word == b"false":
            return False
        if word == b"null":
            return None
        # number — possibly the start of an indirect reference "N G R"
        try:
            if b"." in word:
                return float(word)
            num = int(word)
        except ValueError:
            raise PdfError(f"unexpected token {word!r}") from None
        save = self.pos
        self._skip_ws()
        gen_word = self._word()
        if gen_word.isdigit():
            self._skip_ws()
            if self._word() == b"R":
                return _Ref(num, int(gen_word))
        self.pos = save  # plain number: rewind past the lookahead
        return num

    def _dict_or_stream(self):
        d, n = self.data, len(self.data)
        out = {}
        while True:
            self._skip_ws()
            if d[self.pos:self.pos + 2] == b">>":
                self.pos += 2
                break
            if self.pos >= n:
                raise PdfError("unterminated dictionary")
            if d[self.pos] != 0x2F:
                raise PdfError(
                    f"dictionary key must be a name at {self.pos}"
                )
            self.pos += 1
            key = self._name()
            out[key] = self.read_object()
        save = self.pos
        self._skip_ws()
        if d[self.pos:self.pos + 6] == b"stream":
            self.pos += 6
            if d[self.pos:self.pos + 2] == b"\r\n":
                self.pos += 2
            elif self.pos < n and d[self.pos] in b"\n\r":
                self.pos += 1
            return _Stream(out, b"")  # raw filled by caller (needs /Length)
        self.pos = save
        return out


def _parse_xref_table(data: bytes, start: int):
    """Parse one classic xref section + trailer at ``start``.

    Returns (offsets: {obj_num: offset}, trailer: dict)."""
    lx = _Lexer(data, start)
    word = lx._word()
    if word != b"xref":
        if word.isdigit():
            # startxref pointed at "N 0 obj": a PDF 1.5 xref STREAM
            raise PdfError(
                "cross-reference streams (PDF 1.5 /Type /XRef) are not"
                " supported; only classic xref tables"
            )
        raise PdfError(f"expected 'xref' at offset {start}, found {word!r}")
    offsets: dict[int, int] = {}
    while True:
        lx._skip_ws()
        if data[lx.pos:lx.pos + 7] == b"trailer":
            lx.pos += 7
            lx._skip_ws()
            if data[lx.pos:lx.pos + 2] != b"<<":
                raise PdfError("trailer is not a dictionary")
            lx.pos += 2
            trailer = lx._dict_or_stream()
            if isinstance(trailer, _Stream):
                raise PdfError("trailer cannot carry a stream")
            return offsets, trailer
        first = lx._word()
        count = lx._word()
        if not (first.isdigit() and count.isdigit()):
            raise PdfError(
                f"malformed xref subsection header {first!r} {count!r}"
            )
        first_i, count_i = int(first), int(count)
        for k in range(count_i):
            lx._skip_ws()
            entry = data[lx.pos:lx.pos + 18]
            if len(entry) < 18:
                raise PdfError("truncated xref entry")
            lx.pos += 18
            off, _gen, kind = entry[0:10], entry[11:16], entry[17:18]
            if kind == b"n":
                offsets.setdefault(first_i + k, int(off))
            elif kind != b"f":
                raise PdfError(f"bad xref entry kind {kind!r}")


class _Pdf:
    """Lazy object store over one PDF file (classic xref)."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise PdfError("missing %PDF- header")
        self.data = data
        tail = data[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise PdfError("missing startxref")
        self.offsets: dict[int, int] = {}
        self.trailer: dict = {}
        seen = set()
        start = int(m.group(1))
        # walk /Prev chain: earlier sections must not override later ones
        while True:
            if start in seen:
                raise PdfError("circular /Prev xref chain")
            seen.add(start)
            offsets, trailer = _parse_xref_table(data, start)
            for k, v in offsets.items():
                self.offsets.setdefault(k, v)
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            if "Prev" not in trailer:
                break
            start = int(trailer["Prev"])
        self._cache: dict[int, object] = {}
        self._budget = [0]

    def resolve(self, obj):
        while isinstance(obj, _Ref):
            obj = self._load(obj.num)
        return obj

    def _load(self, num: int):
        if num in self._cache:
            return self._cache[num]
        if num not in self.offsets:
            raise PdfError(f"object {num} not in xref")
        lx = _Lexer(self.data, self.offsets[num])
        got_num = lx._word()
        got_gen = lx._word()
        kw = lx._word()
        if kw != b"obj" or not got_num.isdigit() or int(got_num) != num:
            raise PdfError(
                f"xref offset for object {num} does not point at an obj"
                f" header (found {got_num!r} {got_gen!r} {kw!r})"
            )
        obj = lx.read_object()
        if isinstance(obj, _Stream):
            length = self.resolve(obj.dict.get("Length"))
            if not isinstance(length, int) or length < 0:
                raise PdfError(f"object {num}: bad stream /Length")
            obj.raw = self.data[lx.pos:lx.pos + length]
            if len(obj.raw) != length:
                raise PdfError(f"object {num}: stream truncated")
        self._cache[num] = obj
        return obj

    def stream_bytes(self, st: _Stream, what: str) -> bytes:
        """Decode one stream's bytes with bomb bounds."""
        filt = self.resolve(st.dict.get("Filter"))
        if filt is None:
            out = st.raw
        elif filt == "FlateDecode" or (
            isinstance(filt, list) and [self.resolve(f) for f in filt]
            == ["FlateDecode"]
        ):
            dec = zlib.decompressobj()
            try:
                out = dec.decompress(st.raw, PDF_MAX_STREAM_BYTES + 1)
            except zlib.error as e:
                raise PdfError(f"{what}: corrupt Flate stream ({e})")
            if len(out) > PDF_MAX_STREAM_BYTES or dec.unconsumed_tail:
                raise PdfBombError(
                    f"{what}: stream inflates past"
                    f" {PDF_MAX_STREAM_BYTES} bytes"
                )
        else:
            name = filt if isinstance(filt, str) else "+".join(
                str(self.resolve(f)) for f in filt
            )
            raise PdfError(
                f"{what}: unsupported stream filter /{name}"
                " (only /FlateDecode or none)"
            )
        self._budget[0] += len(out)
        if self._budget[0] > PDF_MAX_TOTAL_BYTES:
            raise PdfBombError(
                f"cumulative decoded stream bytes exceed"
                f" {PDF_MAX_TOTAL_BYTES}"
            )
        return out

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise PdfError("trailer /Root missing or not a dictionary")
        node = self.resolve(root.get("Pages"))
        out: list[dict] = []
        stack = [node]
        guard = 0
        while stack:
            guard += 1
            if guard > 100_000:
                raise PdfError("page tree too deep or cyclic")
            nd = self.resolve(stack.pop(0))
            if not isinstance(nd, dict):
                raise PdfError("page tree node is not a dictionary")
            t = self.resolve(nd.get("Type"))
            if t == "Pages":
                kids = self.resolve(nd.get("Kids")) or []
                stack = list(kids) + stack
            elif t == "Page":
                out.append(nd)
            else:
                raise PdfError(f"unexpected page-tree node type {t!r}")
        return out


def _extract_text(content: bytes) -> list[str]:
    """Text lines from one page's (concatenated) content stream.

    Deterministic subset: show operators Tj ' \" TJ inside BT/ET;
    a new line starts on ' (T* semantics), T*, Tm, or any Td/TD with a
    nonzero vertical component. TJ kerning numbers are positioning
    only — they never contribute characters."""
    lx = _Lexer(content, 0)
    stack: list = []
    lines: list[str] = []
    cur: list[str] = []

    def flush():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    n = len(content)
    while True:
        lx._skip_ws()
        if lx.pos >= n:
            break
        c = content[lx.pos]
        if c == 0x2F or c == 0x28 or c == 0x3C or c == 0x5B or (
            0x30 <= c <= 0x39 or c in b"+-."
        ):
            try:
                stack.append(lx.read_object())
            except PdfError:
                lx.pos += 1
            continue
        op = lx._word()
        if not op:
            lx.pos += 1
            continue
        if op == b"Tj":
            if stack and isinstance(stack[-1], bytes):
                cur.append(stack[-1].decode("latin-1"))
        elif op == b"TJ":
            if stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, bytes):
                        cur.append(el.decode("latin-1"))
        elif op == b"'":
            flush()
            if stack and isinstance(stack[-1], bytes):
                cur.append(stack[-1].decode("latin-1"))
        elif op == b'"':
            flush()
            if stack and isinstance(stack[-1], bytes):
                cur.append(stack[-1].decode("latin-1"))
        elif op in (b"Td", b"TD"):
            if len(stack) >= 1 and isinstance(stack[-1], (int, float)):
                if float(stack[-1]) != 0.0:
                    flush()
        elif op == b"T*":
            flush()
        elif op == b"Tm":
            flush()
        elif op in (b"BT", b"ET"):
            flush()
        stack.clear()
    flush()
    return [ln for ln in lines if ln]


def _pdf_date(s) -> str:
    """(D:YYYYMMDDHHmmSS...) → ISO-8601, best effort."""
    if isinstance(s, bytes):
        s = s.decode("latin-1")
    if not isinstance(s, str):
        return ""
    m = re.match(r"D:(\d{4})(\d{2})?(\d{2})?(\d{2})?(\d{2})?(\d{2})?", s)
    if not m:
        return s
    g = m.groups()
    return (
        f"{g[0]}-{g[1] or '01'}-{g[2] or '01'}"
        + (f"T{g[3]}:{g[4] or '00'}:{g[5] or '00'}Z" if g[3] else "")
    )


def parse_pdf(blob: bytes, doc_id: str = "") -> dict:
    """Parse one PDF: page-tree walk, content-stream text extraction,
    Info metadata, image-XObject count, neutral-citation scan.

    Returns dict with keys: ``text`` (one string, lines joined by
    newline), ``lines`` (list), ``title``, ``author``, ``created``,
    ``cite``, ``court``, ``n_pages``, ``n_images``,
    ``n_compressed_streams``."""
    pdf = _Pdf(bytes(blob))
    pages = pdf.pages()
    lines: list[str] = []
    n_images = 0
    n_compressed = 0
    for i, pg in enumerate(pages):
        contents = pdf.resolve(pg.get("Contents"))
        streams = contents if isinstance(contents, list) else [contents]
        buf = []
        for s in streams:
            s = pdf.resolve(s)
            if not isinstance(s, _Stream):
                raise PdfError(f"page {i}: /Contents is not a stream")
            if pdf.resolve(s.dict.get("Filter")) is not None:
                n_compressed += 1
            buf.append(pdf.stream_bytes(s, f"page {i} content"))
        lines.extend(_extract_text(b"\n".join(buf)))
        res = pdf.resolve(pg.get("Resources")) or {}
        xobjs = pdf.resolve(res.get("XObject")) or {}
        if isinstance(xobjs, dict):
            for xo in xobjs.values():
                xo = pdf.resolve(xo)
                if isinstance(xo, _Stream) and pdf.resolve(
                    xo.dict.get("Subtype")
                ) == "Image":
                    n_images += 1
    info = pdf.resolve(pdf.trailer.get("Info")) or {}

    def _s(key):
        v = pdf.resolve(info.get(key))
        if isinstance(v, bytes):
            return v.decode("latin-1")
        return v if isinstance(v, str) else ""

    text = "\n".join(lines)
    cite_m = _CITE_RE.search(text)
    cite = cite_m.group(0) if cite_m else ""
    court = cite_m.group(2) if cite_m else ""
    return {
        "doc_id": doc_id,
        "text": text,
        "lines": lines,
        "title": _s("Title"),
        "author": _s("Author"),
        "created": _pdf_date(pdf.resolve(info.get("CreationDate")) or ""),
        "cite": cite,
        "court": court,
        "n_pages": len(pages),
        "n_images": n_images,
        "n_compressed_streams": n_compressed,
    }


# --------------------------------------------------------------------------
# Encoder twin


def _esc(s: str) -> bytes:
    out = s.encode("latin-1", "replace")
    return (
        out.replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
        .replace(b"\r", b"\\r")
        .replace(b"\n", b"\\n")
    )


def build_pdf(
    paragraphs: list[str],
    title: str = "",
    author: str = "",
    created: str = "",
    paras_per_page: int = 3,
    compress: bool = False,
    tj_arrays: bool = False,
    images: int = 0,
) -> bytes:
    """Assemble a real PDF 1.4 file, deterministically (no timestamps
    beyond the explicit ``created``, pinned object numbering, pinned
    zlib level). ``paragraphs`` become one text line each,
    ``paras_per_page`` per page; ``tj_arrays`` renders every second
    line as a kerned ``TJ`` array split at the first space (same
    extracted text); ``compress`` Flate-encodes every content stream;
    ``images`` embeds that many 2×2 raw /DeviceRGB image XObjects on
    the first page (drawn via Do)."""
    if paras_per_page < 1:
        raise ValueError("paras_per_page must be >= 1")
    paras = list(paragraphs) or [""]
    pages = [
        paras[i:i + paras_per_page]
        for i in range(0, len(paras), paras_per_page)
    ]
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    # numbering: 1 Catalog, 2 Pages, 3 Font, then per page (page, content),
    # then image XObjects, then Info last
    page_ids = [(4 + 2 * i, 5 + 2 * i) for i in range(n_pages)]
    img_ids = [4 + 2 * n_pages + i for i in range(images)]
    info_id = 4 + 2 * n_pages + images
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = b" ".join(b"%d 0 R" % p for p, _ in page_ids)
    objs[2] = b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    objs[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, img_id in enumerate(img_ids):
        px = bytes([(7 * (i + 1)) % 256] * 12)  # 2x2 RGB
        objs[img_id] = (
            b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2"
            b" /ColorSpace /DeviceRGB /BitsPerComponent 8 /Length 12 >>"
            b"\nstream\n" + px + b"\nendstream"
        )
    for i, ((pg_id, ct_id), page_paras) in enumerate(zip(page_ids, pages)):
        ops = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
        for j, para in enumerate(page_paras):
            if j:
                ops.append(b"0 -16 Td")
            if tj_arrays and j % 2 == 1 and " " in para:
                head, tail = para.split(" ", 1)
                ops.append(
                    b"[(" + _esc(head + " ") + b") -250 ("
                    + _esc(tail) + b")] TJ"
                )
            else:
                ops.append(b"(" + _esc(para) + b") Tj")
        ops.append(b"ET")
        if i == 0:
            for k, img_id in enumerate(img_ids):
                ops.append(
                    b"q 2 0 0 2 %d 100 cm /Im%d Do Q" % (72 + 8 * k, k)
                )
        content = b"\n".join(ops)
        if compress:
            body = zlib.compress(content, 6)
            objs[ct_id] = (
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                % len(body) + body + b"\nendstream"
            )
        else:
            objs[ct_id] = (
                b"<< /Length %d >>\nstream\n" % len(content)
                + content + b"\nendstream"
            )
        res = b"/Font << /F1 3 0 R >>"
        if i == 0 and img_ids:
            xo = b" ".join(
                b"/Im%d %d 0 R" % (k, img_id)
                for k, img_id in enumerate(img_ids)
            )
            res += b" /XObject << " + xo + b" >>"
        objs[pg_id] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Resources << " + res + b" >> /Contents %d 0 R >>" % ct_id
        )
    info = b"<<"
    if title:
        info += b" /Title (" + _esc(title) + b")"
    if author:
        info += b" /Author (" + _esc(author) + b")"
    if created:
        info += b" /CreationDate (" + _esc(created) + b")"
    info += b" >>"
    objs[info_id] = info

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n = max(objs) + 1
    out += b"xref\n0 %d\n" % n
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R /Info %d 0 R >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (n, info_id, xref_at)
    )
    return bytes(out)
