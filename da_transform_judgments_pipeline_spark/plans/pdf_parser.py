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


def _png_unpredict(data: bytes, columns: int, what: str) -> bytes:
    """Reverse PNG row predictors 10-15 (ISO 32000 §7.4.4.4 routes them
    to the PNG spec) over ``columns``-byte rows, 1 byte per component —
    the encoding xref streams ship with in practice."""
    rowlen = columns + 1
    if rowlen <= 1 or len(data) % rowlen:
        raise PdfError(
            f"{what}: predictor data length {len(data)} not a multiple"
            f" of row length {rowlen}"
        )
    out = bytearray()
    prev = bytearray(columns)
    for i in range(0, len(data), rowlen):
        ft = data[i]
        row = bytearray(data[i + 1:i + rowlen])
        if ft == 1:  # Sub
            for j in range(1, columns):
                row[j] = (row[j] + row[j - 1]) & 0xFF
        elif ft == 2:  # Up
            for j in range(columns):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(columns):
                left = row[j - 1] if j else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(columns):
                a = row[j - 1] if j else 0
                b = prev[j]
                c = prev[j - 1] if j else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
                row[j] = (row[j] + pred) & 0xFF
        elif ft != 0:
            raise PdfError(f"{what}: unknown PNG filter type {ft}")
        out += row
        prev = row
    return bytes(out)


def _parse_xref_stream(data: bytes, start: int):
    """Parse a PDF 1.5 cross-reference STREAM at ``start`` (ISO 32000
    §7.5.8): a /Type /XRef stream object whose dict doubles as the
    trailer; binary entries of /W field widths, optionally PNG-
    predictor-coded, typed 0 (free) / 1 (offset) / 2 (in an object
    stream).

    Returns (offsets, compressed: {obj: (objstm_num, idx)}, trailer)."""
    lx = _Lexer(data, start)
    num, gen, kw = lx._word(), lx._word(), lx._word()
    if kw != b"obj" or not num.isdigit():
        raise PdfError(
            f"startxref points at neither 'xref' nor an object"
            f" ({num!r} {gen!r} {kw!r})"
        )
    obj = lx.read_object()
    if not isinstance(obj, _Stream) or obj.dict.get("Type") != "XRef":
        raise PdfError("startxref object is not a /Type /XRef stream")
    length = obj.dict.get("Length")
    if not isinstance(length, int):
        raise PdfError("xref stream /Length must be a direct integer")
    obj.raw = data[lx.pos:lx.pos + length]
    if len(obj.raw) != length:
        raise PdfError("xref stream truncated")
    filt = obj.dict.get("Filter")
    if filt is None:
        body = obj.raw
    elif filt == "FlateDecode":
        dec = zlib.decompressobj()
        try:
            body = dec.decompress(obj.raw, PDF_MAX_STREAM_BYTES + 1)
        except zlib.error as e:
            raise PdfError(f"xref stream: corrupt Flate data ({e})")
        if len(body) > PDF_MAX_STREAM_BYTES or dec.unconsumed_tail:
            raise PdfBombError("xref stream inflates past bound")
    else:
        raise PdfError(f"xref stream: unsupported filter /{filt}")
    parms = obj.dict.get("DecodeParms") or {}
    if isinstance(parms, dict) and parms.get("Predictor", 1) >= 10:
        body = _png_unpredict(
            body, int(parms.get("Columns", 1)), "xref stream"
        )
    elif isinstance(parms, dict) and parms.get("Predictor", 1) != 1:
        raise PdfError(
            f"xref stream: unsupported predictor {parms.get('Predictor')}"
        )
    w = obj.dict.get("W")
    if not (isinstance(w, list) and len(w) == 3
            and all(isinstance(x, int) for x in w)):
        raise PdfError(f"xref stream: bad /W {w!r}")
    size = obj.dict.get("Size")
    index = obj.dict.get("Index") or [0, size]
    if not isinstance(size, int) or len(index) % 2:
        raise PdfError("xref stream: bad /Size or /Index")
    entry_len = sum(w)
    offsets: dict[int, int] = {}
    compressed: dict[int, tuple[int, int]] = {}
    pos = 0
    for k in range(0, len(index), 2):
        first, count = int(index[k]), int(index[k + 1])
        for obj_num in range(first, first + count):
            if pos + entry_len > len(body):
                raise PdfError("xref stream: entry data truncated")
            fields = []
            for width in w:
                fields.append(
                    int.from_bytes(body[pos:pos + width], "big")
                    if width else None
                )
                pos += width
            ftype = fields[0] if w[0] else 1  # absent type defaults to 1
            if ftype == 1:
                offsets.setdefault(obj_num, fields[1])
            elif ftype == 2:
                compressed.setdefault(
                    obj_num, (fields[1], fields[2] or 0)
                )
            elif ftype != 0:
                raise PdfError(f"xref stream: unknown entry type {ftype}")
    return offsets, compressed, dict(obj.dict)


def _parse_xref_table(data: bytes, start: int):
    """Parse one classic xref section + trailer at ``start``.

    Returns (offsets: {obj_num: offset}, trailer: dict)."""
    lx = _Lexer(data, start)
    word = lx._word()
    if word != b"xref":
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
        self.compressed: dict[int, tuple[int, int]] = {}
        self.trailer: dict = {}
        seen = set()
        start = int(m.group(1))
        # walk /Prev chain: earlier sections must not override later ones
        while True:
            if start in seen:
                raise PdfError("circular /Prev xref chain")
            seen.add(start)
            probe = _Lexer(data, start)
            if probe._word() == b"xref":
                offsets, trailer = _parse_xref_table(data, start)
                compressed = {}
                # hybrid-reference file: the classic trailer points at a
                # companion xref stream for 1.5-aware readers
                if "XRefStm" in trailer:
                    so, sc, _ = _parse_xref_stream(
                        data, int(trailer["XRefStm"])
                    )
                    offsets = {**so, **offsets}
                    compressed = sc
            else:
                offsets, compressed, trailer = _parse_xref_stream(
                    data, start
                )
            for k, v in offsets.items():
                self.offsets.setdefault(k, v)
            for k, v in compressed.items():
                self.compressed.setdefault(k, v)
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            if "Prev" not in trailer:
                break
            start = int(trailer["Prev"])
        self._cache: dict[int, object] = {}
        self._objstms: dict[int, tuple[list, bytes, int]] = {}
        self._budget = [0]

    def resolve(self, obj):
        while isinstance(obj, _Ref):
            obj = self._load(obj.num)
        return obj

    def _objstm(self, stm_num: int) -> tuple[list, bytes, int]:
        """Load + decode one /Type /ObjStm container (ISO 32000 §7.5.7):
        N (objnum, offset) header pairs, then the object bodies."""
        if stm_num in self._objstms:
            return self._objstms[stm_num]
        container = self._load(stm_num)
        if not isinstance(container, _Stream) or self.resolve(
            container.dict.get("Type")
        ) != "ObjStm":
            raise PdfError(
                f"object {stm_num} is not an object stream container"
            )
        n = self.resolve(container.dict.get("N"))
        first = self.resolve(container.dict.get("First"))
        if not isinstance(n, int) or not isinstance(first, int):
            raise PdfError(f"objstm {stm_num}: bad /N or /First")
        buf = self.stream_bytes(container, f"objstm {stm_num}")
        lx = _Lexer(buf, 0)
        pairs = []
        for _ in range(n):
            a, b = lx._word(), lx._word()
            if not (a.isdigit() and b.isdigit()):
                raise PdfError(f"objstm {stm_num}: malformed pair table")
            pairs.append((int(a), int(b)))
        out = (pairs, buf, first)
        self._objstms[stm_num] = out
        return out

    def _load(self, num: int):
        if num in self._cache:
            return self._cache[num]
        if num not in self.offsets:
            if num in self.compressed:
                stm_num, idx = self.compressed[num]
                pairs, buf, first = self._objstm(stm_num)
                if idx >= len(pairs) or pairs[idx][0] != num:
                    # tolerate index drift: find the object by number
                    hits = [p for p in pairs if p[0] == num]
                    if not hits:
                        raise PdfError(
                            f"object {num} not in objstm {stm_num}"
                        )
                    off = hits[0][1]
                else:
                    off = pairs[idx][1]
                lx = _Lexer(buf, first + off)
                obj = lx.read_object()
                if isinstance(obj, _Stream):
                    raise PdfError(
                        f"object {num}: streams cannot live inside an"
                        " object stream"
                    )
                self._cache[num] = obj
                return obj
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
    xref_stream: bool = False,
    obj_streams: bool = False,
) -> bytes:
    """Assemble a real PDF 1.4 file, deterministically (no timestamps
    beyond the explicit ``created``, pinned object numbering, pinned
    zlib level). ``paragraphs`` become one text line each,
    ``paras_per_page`` per page; ``tj_arrays`` renders every second
    line as a kerned ``TJ`` array split at the first space (same
    extracted text); ``compress`` Flate-encodes every content stream;
    ``images`` embeds that many 2×2 raw /DeviceRGB image XObjects on
    the first page (drawn via Do).

    ``xref_stream`` writes a PDF 1.5 cross-reference STREAM (W=[1,4,2]
    binary entries, PNG Up predictor, Flate) instead of the classic
    table; ``obj_streams`` additionally packs every non-stream object
    into one Flate-coded /Type /ObjStm container referenced by type-2
    xref entries (requires ``xref_stream``). All modes decode to the
    same document."""
    if paras_per_page < 1:
        raise ValueError("paras_per_page must be >= 1")
    if obj_streams and not xref_stream:
        raise ValueError(
            "obj_streams requires xref_stream (classic tables cannot"
            " express type-2 entries)"
        )
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

    compressed_into: dict[int, tuple[int, int]] = {}
    objstm_id = info_id + 1
    if obj_streams:
        dict_nums = [k for k in sorted(objs) if b"\nstream\n" not in objs[k]]
        hdr_parts, body = [], bytearray()
        for k in dict_nums:
            hdr_parts.append(b"%d %d" % (k, len(body)))
            body += objs[k] + b"\n"
        hdr = b" ".join(hdr_parts) + b"\n"
        payload = hdr + bytes(body)
        zbody = zlib.compress(payload, 6)
        for i, k in enumerate(dict_nums):
            compressed_into[k] = (objstm_id, i)
            del objs[k]
        objs[objstm_id] = (
            b"<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode"
            b" /Length %d >>\nstream\n" % (len(dict_nums), len(hdr),
                                           len(zbody))
            + zbody + b"\nendstream"
        )

    version = b"1.5" if xref_stream else b"1.4"
    out = bytearray(b"%PDF-" + version + b"\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"

    if not xref_stream:
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

    xref_id = max(list(objs) + list(compressed_into)) + 1
    size = xref_id + 1
    xref_at = len(out)
    raw_rows = []
    for num in range(size):
        if num == 0:
            t, f2, f3 = 0, 0, 65535
        elif num == xref_id:
            t, f2, f3 = 1, xref_at, 0
        elif num in offsets:
            t, f2, f3 = 1, offsets[num], 0
        else:
            t, (stm, idx) = 2, compressed_into[num]
            f2, f3 = stm, idx
        raw_rows.append(
            bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
        )
    # PNG Up predictor over 7-byte rows (what real writers emit)
    filtered = bytearray()
    prev = bytes(7)
    for row in raw_rows:
        filtered += b"\x02" + bytes(
            (row[j] - prev[j]) & 0xFF for j in range(7)
        )
        prev = row
    z = zlib.compress(bytes(filtered), 6)
    out += (
        b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Index [0 %d]"
        b" /Root 1 0 R /Info %d 0 R /Filter /FlateDecode"
        b" /DecodeParms << /Predictor 12 /Columns 7 >> /Length %d"
        b" >>\nstream\n" % (xref_id, size, size, info_id, len(z))
        + z + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)
