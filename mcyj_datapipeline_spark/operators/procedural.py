"""The procedural edge (SURVEY §2.11 U1–U4): the only kernels in the
whole engine that genuinely cannot be column expressions — external
libraries (PDF extraction) and network calls (HTTP download, LLM
enrichment). All are Arrow-batched ``mapInPandas`` with injectable
clients so tests run hermetically and rate limiting happens inside the
partition (reference sleeps between calls; here the partition is the
rate-limit domain and ``repartition(n)`` sets the concurrency).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from mcyj_datapipeline_spark.operators.partitioning import spread_for_compute

PDF_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("sha256", T.StringType()),
        T.StructField("text", T.ArrayType(T.StringType())),
        T.StructField("dateprocessed", T.StringType()),
    ]
)


def _fake_pdf_pages(content: bytes) -> list[str]:
    """Deterministic fake extractor (env has no pdfplumber): derives page
    texts from the bytes. STUB — swap for pdfplumber per U1
    (reference extract_pdf_text.py:98-105)."""
    n_pages = 1 + (len(content) % 5)
    return [f"page {i} len {len(content)}" for i in range(1, n_pages + 1)]


def extract_pdf_text(
    df: DataFrame,
    content_col: str = "content",
    sha_col: str = "sha256",
    extractor: Callable[[bytes], list[str]] | None = None,
    processed_at: str = "1970-01-01T00:00:00+00:00",
) -> DataFrame:
    """U1: binary PDF content → pages array. 1 row in → 1 row out,
    Arrow-batched. The real pdfplumber kernel plugs into ``extractor``;
    the timestamp is injected (not ``now()``) so re-runs are
    deterministic and the operator stays a pure function."""
    extract = extractor
    if extract is None:
        try:  # pragma: no cover - env-dependent
            import pdfplumber  # noqa: F401

            def extract(content: bytes) -> list[str]:
                import io

                with pdfplumber.open(io.BytesIO(content)) as pdf:
                    return [p.extract_text() or "" for p in pdf.pages]

        except ImportError:
            extract = _fake_pdf_pages

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for sha, content in zip(pdf_batch[sha_col], pdf_batch[content_col]):
                pages = extract(bytes(content) if content is not None else b"")
                rows.append((sha, pages, processed_at))
            yield pd.DataFrame(rows, columns=["sha256", "text", "dateprocessed"])

    src = spread_for_compute(df.select(sha_col, content_col), sha_col)
    return src.mapInPandas(kernel, PDF_TEXT_SCHEMA)


LLM_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("sha256", T.StringType()),
        T.StructField("response", T.StringType()),
        T.StructField("violation", T.StringType()),
        T.StructField("input_tokens", T.LongType()),
        T.StructField("output_tokens", T.LongType()),
        T.StructField("cached_tokens", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def mock_llm_client(document_text: str, prompt: str) -> dict:
    """Deterministic mock of the OpenRouter/DeepSeek client (U2,
    reference update_sir_summaries.py:154-259). Verdict derives from
    the document content so tests have both classes."""
    violation = "y" if "violation" in document_text.lower() else "n"
    body = json.dumps(
        {"summary": f"summary of {len(document_text)} chars", "violation": violation}
    )
    return {
        "text": body,
        "input_tokens": len(document_text) // 4,
        "output_tokens": len(body) // 4,
        "cached_tokens": 0,
    }


def llm_enrich(
    df: DataFrame,
    prompt: str,
    client: Callable[[str, str], dict] | None = None,
    text_col: str = "full_text",
    sha_col: str = "sha256",
    sleep_s: float = 0.0,
) -> DataFrame:
    """U2: per-document LLM enrichment with usage accounting.

    The prompt builder keeps the document FIRST and the query LAST to
    preserve provider prompt-cache reuse (reference
    update_sir_summaries.py:168-170 / README.md:248-256). Rate limiting
    (T5) is per-partition sleep; partition count bounds concurrency."""
    call = client or mock_llm_client

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for sha, text in zip(pdf_batch[sha_col], pdf_batch[text_col]):
                start = time.monotonic()
                result = call(text or "", prompt)
                parsed = {}
                try:
                    parsed = json.loads(result["text"])
                except (ValueError, TypeError):
                    parsed = {}
                rows.append(
                    (
                        sha,
                        parsed.get("summary", ""),
                        parsed.get("violation", ""),
                        int(result.get("input_tokens", 0)),
                        int(result.get("output_tokens", 0)),
                        int(result.get("cached_tokens", 0)),
                        int((time.monotonic() - start) * 1000),
                    )
                )
                if sleep_s:
                    time.sleep(sleep_s)
            yield pd.DataFrame(rows, columns=[f.name for f in LLM_RESULT_SCHEMA])

    src = spread_for_compute(df.select(sha_col, text_col), sha_col)
    return src.mapInPandas(kernel, LLM_RESULT_SCHEMA)


DOWNLOAD_SCHEMA = T.StructType(
    [
        T.StructField("ContentDocumentId", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("download_status", T.StringType()),
    ]
)


def download_documents(
    df: DataFrame,
    fetcher: Callable[[str], bytes | None],
    id_col: str = "ContentDocumentId",
    sleep_s: float = 0.0,
) -> DataFrame:
    """U3 (reference download_pdf.py:58-116): fetch + hash per id with an
    injectable fetcher. Hashing here (not a second pass) so the bytes
    cross the wire once."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for doc_id in pdf_batch[id_col]:
                content = fetcher(doc_id)
                if content is None:
                    rows.append((doc_id, None, "", "failed"))
                else:
                    rows.append(
                        (
                            doc_id,
                            content,
                            hashlib.sha256(content).hexdigest(),
                            "downloaded",
                        )
                    )
                if sleep_s:
                    time.sleep(sleep_s)
            yield pd.DataFrame(
                rows,
                columns=["ContentDocumentId", "content", "sha256", "download_status"],
            )

    return df.select(id_col).mapInPandas(kernel, DOWNLOAD_SCHEMA)


def salvage_json(text: str) -> dict | None:
    """U4 (reference update_violation_levels.py:294-320): brace-matching
    JSON extraction for when the regex/from_json path fails — scans for
    the first balanced ``{...}`` that parses. Driver/UDF-side helper."""
    if not text:
        return None
    start = None
    depth = 0
    for i, ch in enumerate(text):
        if ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}" and depth > 0:
            depth -= 1
            if depth == 0 and start is not None:
                try:
                    return json.loads(text[start : i + 1])
                except ValueError:
                    start = None
    return None


# ---------------------------------------------------------------------------
# Real PDF text extraction for the simple subset (stdlib-only) — the
# same pattern as the WAV/PNG kernels in multimodal.py: pdfplumber
# remains the auto-path for arbitrary PDFs, but uncompressed/Flate
# content streams with literal-string Tj/TJ operators need no external
# library at all.
# ---------------------------------------------------------------------------


def _pdf_show_op(text: str) -> bytes:
    """One ``Tj`` show op for ``text``: a latin-1 literal string when
    the text fits in one byte per char, else a BOM-prefixed UTF-16BE
    hex string (the PDF text-string convention; real reference pages
    are ~60% non-latin-1 — smart quotes, bullets)."""
    try:
        raw = text.encode("latin-1")
        esc = (
            raw.replace(b"\\", rb"\\")
            .replace(b"(", rb"\(")
            .replace(b")", rb"\)")
        )
        return b"(" + esc + b") Tj"
    except UnicodeEncodeError:
        payload = b"\xfe\xff" + text.encode("utf-16-be")
        return b"<" + payload.hex().encode() + b"> Tj"


def synth_simple_pdf(page_texts: list[str]) -> bytes:
    """A syntactically complete N-page PDF (catalog, page tree, one
    Flate content stream per page, xref, trailer) drawing each page's
    text with the built-in Helvetica — valid input for pdfplumber AND
    for :func:`_stdlib_pdf_pages`. Non-latin-1 pages are shown as
    UTF-16BE hex strings (see :func:`_pdf_show_op`)."""
    import zlib

    n = len(page_texts)
    # object numbering: 1 catalog, 2 pages, 3 font, then per page i:
    # (4+2i) page object, (5+2i) content stream
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n))
    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode(),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    for i, text in enumerate(page_texts):
        stream = zlib.compress(
            b"BT /F1 12 Tf 72 720 Td " + _pdf_show_op(text) + b" ET"
        )
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {5 + 2 * i} 0 R "
                f"/Resources << /Font << /F1 3 0 R >> >> >>"
            ).encode()
        )
        objects.append(
            f"<< /Length {len(stream)} /Filter /FlateDecode >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for idx, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{idx} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _png_predict_encode(data: bytes, columns: int, filter_type: int = 2) -> bytes:
    """Apply a PNG row filter (for synth: Up=2) so tests can emit
    Predictor-12 streams; rows padded to ``columns`` with spaces."""
    pad = (-len(data)) % columns
    data = data + b" " * pad
    out = bytearray()
    prev = bytearray(columns)
    for r in range(0, len(data), columns):
        row = bytearray(data[r : r + columns])
        enc = bytearray(columns)
        for i in range(columns):
            enc[i] = (row[i] - prev[i]) % 256 if filter_type == 2 else row[i]
        out.append(filter_type if filter_type == 2 else 0)
        out += enc
        prev = row
    return bytes(out)


def synth_advanced_pdf(page_texts: list[str]) -> bytes:
    """A PDF exercising the REAL-file features the simple generator
    skips — the shapes Word/Adobe emit (reference corpus provenance:
    extract_pdf_text.py) :

    * page 0 split across TWO content streams (``/Contents [a, b]``),
      the second one FlateDecode + **PNG Predictor 12** (``/DecodeParms
      << /Predictor 12 /Columns N >>``),
    * a ``TJ`` array mixing literal strings, kerning numbers, and hex
      strings,
    * octal escapes (``\\ddd``) in literal strings.

    Pages after the first use plain single-stream Flate layout."""
    import zlib

    n = max(1, len(page_texts))
    texts = list(page_texts) or [""]
    # objects: 1 catalog, 2 pages, 3 font; page 0 = obj 4 + streams 5,6;
    # pages i>=1 = obj (5+2i), stream (6+2i)
    kids = " ".join(
        ("4 0 R" if i == 0 else f"{5 + 2 * i} 0 R") for i in range(n)
    )
    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode(),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    # --- page 0: split text across two streams, stream B predictor-12
    t0 = texts[0]
    half = len(t0) // 2
    a_txt, b_txt = t0[:half], t0[half:]
    # stream A: TJ array with kerning numbers + octal escape demo — the
    # octal spells the FIRST char of a_txt when it is latin-1
    ops_a = b"BT /F1 12 Tf 72 720 Td "
    try:
        raw = a_txt.encode("latin-1")
        if raw:
            # TJ array mixing: octal-escaped literal (first char), a
            # kerning number, then the REST as a plain latin-1 hex
            # string — reconstructs a_txt exactly
            first_oct = f"\\{raw[0]:03o}".encode()
            ops_a += (
                b"[(" + first_oct + b") -250 <"
                + raw[1:].hex().encode() + b">] TJ "
            )
        else:
            ops_a += b"[()] TJ "
    except UnicodeEncodeError:
        ops_a += b"<" + (b"\xfe\xff" + a_txt.encode("utf-16-be")).hex().encode() + b"> Tj "
    ops_a += b"ET"
    stream_a = zlib.compress(ops_a)
    ops_b = b"BT /F1 12 Tf 72 700 Td " + _pdf_show_op(b_txt) + b" ET"
    cols = 16
    stream_b = zlib.compress(_png_predict_encode(ops_b, cols))
    objects.append(
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents [5 0 R 6 0 R] "
        b"/Resources << /Font << /F1 3 0 R >> >> >>"
    )
    objects.append(
        f"<< /Length {len(stream_a)} /Filter /FlateDecode >>\nstream\n".encode()
        + stream_a
        + b"\nendstream"
    )
    objects.append(
        (
            f"<< /Length {len(stream_b)} /Filter /FlateDecode "
            f"/DecodeParms << /Predictor 12 /Columns {cols} >> >>\nstream\n"
        ).encode()
        + stream_b
        + b"\nendstream"
    )
    for i, text in enumerate(texts[1:], start=1):
        stream = zlib.compress(
            b"BT /F1 12 Tf 72 720 Td " + _pdf_show_op(text) + b" ET"
        )
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {6 + 2 * i} 0 R "
                f"/Resources << /Font << /F1 3 0 R >> >> >>"
            ).encode()
        )
        objects.append(
            f"<< /Length {len(stream)} /Filter /FlateDecode >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for idx, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{idx} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


_PDF_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\f",
}


def _pdf_decode_literal(raw: bytes) -> str:
    """PDF literal-string unescape: ``\\n \\r \\t \\b \\f \\( \\) \\\\``,
    1-3 digit octal ``\\ddd``, and backslash-newline continuations."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        c = raw[i]
        if c in _PDF_ESCAPES:
            out += _PDF_ESCAPES[c]
            i += 1
        elif 0x30 <= c <= 0x37:  # octal, up to 3 digits
            j = i
            while j < n and j - i < 3 and 0x30 <= raw[j] <= 0x37:
                j += 1
            out.append(int(raw[i:j], 8) & 0xFF)
            i = j
        elif c in (0x0A, 0x0D):  # line continuation
            i += 1
            if c == 0x0D and i < n and raw[i] == 0x0A:
                i += 1
        else:  # \( \) \\ and unknown escapes -> the char itself
            out.append(c)
            i += 1
    return out.decode("latin-1")


def _pdf_decode_hex(raw: bytes) -> str:
    """PDF hex-string decode. BOM ``FEFF`` prefix → UTF-16BE (the PDF
    text-string convention; how non-latin-1 text round-trips without a
    font CMap); otherwise one byte per char via latin-1."""
    h = bytes(raw).translate(None, b" \t\r\n")
    if len(h) % 2:
        h += b"0"  # PDF: odd final digit implies trailing 0
    try:
        b = bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return ""
    if b[:2] == b"\xfe\xff":
        return b[2:].decode("utf-16-be", errors="replace")
    return b.decode("latin-1")


_PDF_SHOW_RE = None  # compiled lazily; pattern below


def _pdf_text_ops(body: bytes) -> str:
    """Pull shown text from one decoded content stream IN ORDER:
    literal/hex strings via ``Tj`` ``'`` ``\"`` and ``TJ`` arrays
    (mixing literal, hex, and kerning numbers)."""
    import re

    global _PDF_SHOW_RE
    if _PDF_SHOW_RE is None:
        _PDF_SHOW_RE = re.compile(
            rb"\(((?:\\.|[^\\()])*)\)\s*(?:Tj|'|\")"  # literal show
            rb"|<([0-9A-Fa-f\s]*)>\s*(?:Tj|'|\")"  # hex show
            rb"|\[((?:\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>|[^\]])*)\]\s*TJ",
            re.DOTALL,
        )
    parts: list[str] = []
    for m in _PDF_SHOW_RE.finditer(body):
        lit, hx, arr = m.group(1), m.group(2), m.group(3)
        if lit is not None:
            parts.append(_pdf_decode_literal(lit))
        elif hx is not None:
            parts.append(_pdf_decode_hex(hx))
        else:
            for em in re.finditer(
                rb"\(((?:\\.|[^\\()])*)\)|<([0-9A-Fa-f\s]*)>", arr
            ):
                el, eh = em.group(1), em.group(2)
                parts.append(
                    _pdf_decode_literal(el)
                    if el is not None
                    else _pdf_decode_hex(eh)
                )
    return "".join(parts)


def _png_unpredict(data: bytes, columns: int, colors: int = 1,
                   bpc: int = 8) -> bytes:
    """Undo PNG row filters (Predictor 10-15): Sub/Up/Average/Paeth per
    row, ``columns*colors*bpc/8`` bytes per row + 1 filter byte."""
    bpp = max(1, colors * bpc // 8)
    rowlen = columns * bpp
    out = bytearray()
    prev = bytearray(rowlen)
    for r in range(0, len(data) - rowlen, rowlen + 1):
        ft = data[r]
        row = bytearray(data[r + 1 : r + 1 + rowlen])
        if ft == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) % 256
        elif ft == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) % 256
        elif ft == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (left + prev[i]) // 2) % 256
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[i] = (row[i] + pred) % 256
        out += row
        prev = row
    return bytes(out)


def _pdf_decode_stream(sdict: bytes, body: bytes) -> bytes | None:
    """Decode one content stream: FlateDecode + optional PNG predictor
    (``/DecodeParms << /Predictor >= 10 /Columns N >>`` — how Word/
    Adobe compress xref and occasionally content streams)."""
    import re
    import zlib

    if b"FlateDecode" in sdict:
        try:
            body = zlib.decompress(body)
        except zlib.error:
            return None
    pm = re.search(rb"/Predictor\s+(\d+)", sdict)
    if pm and int(pm.group(1)) >= 10:
        cm = re.search(rb"/Columns\s+(\d+)", sdict)
        colors = re.search(rb"/Colors\s+(\d+)", sdict)
        bpc = re.search(rb"/BitsPerComponent\s+(\d+)", sdict)
        body = _png_unpredict(
            body,
            int(cm.group(1)) if cm else 1,
            int(colors.group(1)) if colors else 1,
            int(bpc.group(1)) if bpc else 8,
        )
    return body


def _pdf_objects(content: bytes) -> dict[int, bytes]:
    """``num 0 obj ... endobj`` spans by object number. Stream extents
    honor the dict's direct ``/Length`` when present, so compressed
    bytes that happen to contain ``endobj``/``endstream`` cannot
    truncate an object (generation numbers ignored — no incremental
    updates in the simple subset)."""
    import re

    objects: dict[int, bytes] = {}
    header = re.compile(rb"(\d+)\s+\d+\s+obj\b")
    stream_kw = re.compile(rb"stream\r?\n")
    pos = 0
    while True:
        # sequential cursor, jumping past each object's full extent —
        # a blind finditer would also match 'N M obj' byte patterns
        # INSIDE compressed stream bodies and clobber real objects
        m = header.search(content, pos)
        if m is None:
            return objects
        num = int(m.group(1))
        start = m.end()
        em = content.find(b"endobj", start)
        sm = stream_kw.search(content, start)
        if sm is not None and (em == -1 or sm.start() < em):
            lm = re.search(rb"/Length\s+(\d+)\b", content[start : sm.start()])
            if lm:
                es = sm.end() + int(lm.group(1))
            else:
                es = content.find(b"endstream", sm.end())
            em = content.find(b"endobj", es if es != -1 else sm.end())
        if em == -1:
            return objects
        objects[num] = content[start:em]
        pos = em + len(b"endobj")


def _pdf_object_stream(obj: bytes) -> tuple[bytes, bytes] | None:
    """Split one object span into (stream dict, raw stream body). The
    body extent honors a direct ``/Length`` so compressed bytes that
    contain ``endstream`` cannot truncate it."""
    import re

    sm = re.search(rb"<<(.*?)>>\s*stream\r?\n", obj, re.DOTALL)
    if sm is None:
        return None
    sdict = sm.group(1)
    lm = re.search(rb"/Length\s+(\d+)\b", sdict)
    if lm:
        # exact extent — do NOT strip: compressed data may legitimately
        # end with 0x0A/0x0D bytes
        body = obj[sm.end() : sm.end() + int(lm.group(1))]
    else:
        e = obj.find(b"endstream", sm.end())
        body = obj[sm.end() : e if e != -1 else len(obj)]
        # no /Length: drop at most ONE trailing EOL (the separator
        # before 'endstream' the spec mandates)
        if body.endswith(b"\r\n"):
            body = body[:-2]
        elif body.endswith((b"\n", b"\r")):
            body = body[:-1]
    return sdict, body


def _pdf_page_text(objects: dict[int, bytes], page_obj: bytes) -> str:
    """Decode a /Page object's /Contents (single ref or array of refs,
    each possibly multi-stream — Word splits page content) and pull the
    shown text in stream order."""
    import re

    cm = re.search(
        rb"/Contents\s+(?:(\d+)\s+\d+\s+R|\[((?:\s*\d+\s+\d+\s+R)*)\s*\])",
        page_obj,
    )
    if not cm:
        return ""
    refs = (
        [int(cm.group(1))]
        if cm.group(1)
        else [int(r) for r in re.findall(rb"(\d+)\s+\d+\s+R", cm.group(2))]
    )
    texts: list[str] = []
    for ref in refs:
        obj = objects.get(ref)
        if obj is None:
            continue
        split = _pdf_object_stream(obj)
        if split is None:
            continue
        body = _pdf_decode_stream(*split)
        if body is not None:
            texts.append(_pdf_text_ops(body))
    return "".join(texts)


def _stdlib_pdf_pages(content: bytes) -> list[str]:
    """REAL extractor for the simple-PDF subset, structured walk first:
    parse the object table, follow trailer ``/Root`` → catalog
    ``/Pages`` → ``/Kids`` in tree order, decode each page's
    ``/Contents`` (single or array; FlateDecode, optional PNG
    predictor) and pull ``Tj``/``'``/``\"``/``TJ`` strings (literal
    with full escape/octal handling, hex with UTF-16BE BOM support) in
    op order. Falls back to the flat stream scan when the structure is
    unparsable (broken xref etc.). Raises ValueError when the file is
    not a PDF — poison policy belongs to the caller, exactly like the
    PNG kernel.

    Documented limits (the pdfplumber auto-path covers these): font
    CMap/ToUnicode remapping, object streams (``/ObjStm`` can hold
    page DICTS; content streams themselves can never live inside one),
    encrypted files, incremental updates."""
    import re

    if not content.startswith(b"%PDF"):
        raise ValueError("not a PDF")
    # ---- structured: object table + page tree walk
    try:
        objects = _pdf_objects(content)
        root_m = re.search(rb"/Root\s+(\d+)\s+\d+\s+R", content)
        catalog = objects.get(int(root_m.group(1))) if root_m else None
        pages_m = (
            re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", catalog)
            if catalog
            else None
        )
        page_objs: list[bytes] = []

        def walk_kids(node: bytes, depth: int = 0) -> None:
            if depth > 32:  # cycle guard
                return
            kids_m = re.search(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)*)\s*\]", node)
            if not kids_m:
                return
            for ref in re.findall(rb"(\d+)\s+\d+\s+R", kids_m.group(1)):
                kid = objects.get(int(ref))
                if kid is None:
                    continue
                if re.search(rb"/Type\s*/Page\b", kid) and not re.search(
                    rb"/Type\s*/Pages\b", kid
                ):
                    page_objs.append(kid)
                else:
                    walk_kids(kid, depth + 1)

        if pages_m and int(pages_m.group(1)) in objects:
            walk_kids(objects[int(pages_m.group(1))])
        if page_objs:
            return [_pdf_page_text(objects, p) for p in page_objs]
    except Exception:
        pass
    # ---- fallback: flat scan in file-offset order, one text-bearing
    # stream per page (no trailer/page tree needed)
    pages: list[str] = []
    for obj in _pdf_objects(content).values():
        split = _pdf_object_stream(obj)
        if split is None:
            continue
        body = _pdf_decode_stream(*split)
        if body is None:
            continue
        page = _pdf_text_ops(body)
        if page:
            pages.append(page)
    return pages


# ---------------------------------------------------------------------------
# Real HTML text extraction (stdlib html.parser) — the main-content
# step of every web-corpus pipeline (trafilatura-lite). Lenient parser:
# malformed markup degrades, never raises.
# ---------------------------------------------------------------------------

HTML_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_links", T.IntegerType()),
    ]
)

_HTML_SKIP_TAGS = {"script", "style", "noscript", "template", "head"}

# Block-level boundaries get a whitespace separator so "<h1>A</h1><p>B"
# reads "A B", while inline tags (<b>, <span>) never split words.
_HTML_BLOCK_TAGS = {
    "p", "div", "section", "article", "header", "footer", "aside", "nav",
    "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol", "table", "tr",
    "td", "th", "br", "hr", "blockquote", "pre", "figure", "figcaption",
}


def _extract_html(content: str) -> tuple[str, str, int]:
    """(title, visible text, link count) via stdlib html.parser:
    script/style/head subtrees are skipped (title excepted), character
    references decode automatically, whitespace collapses to single
    spaces — the plain-text view a quality filter should score."""
    import re
    from html.parser import HTMLParser

    class _P(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.skip_depth = 0
            self.in_title = False
            self.title_parts: list[str] = []
            self.text_parts: list[str] = []
            self.n_links = 0

        def handle_starttag(self, tag, attrs):
            if tag in _HTML_SKIP_TAGS:
                self.skip_depth += 1
            if tag == "title":
                self.in_title = True
            if tag == "a":
                self.n_links += 1
            if tag in _HTML_BLOCK_TAGS:
                self.text_parts.append(" ")

        def handle_endtag(self, tag):
            if tag in _HTML_SKIP_TAGS and self.skip_depth:
                self.skip_depth -= 1
            if tag == "title":
                self.in_title = False
            if tag in _HTML_BLOCK_TAGS:
                self.text_parts.append(" ")

        def handle_data(self, data):
            if self.in_title:
                self.title_parts.append(data)
            elif not self.skip_depth:
                self.text_parts.append(data)

    p = _P()
    p.feed(content)
    p.close()
    collapse = lambda s: re.sub(r"\s+", " ", s).strip()  # noqa: E731
    return (
        collapse("".join(p.title_parts)),
        collapse("".join(p.text_parts)),
        p.n_links,
    )


def extract_html_text(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL HTML → text over a string column, Arrow-batched. One row in,
    one row out; html.parser is lenient so poison markup yields best-
    effort text, never a failed stage. At 100 TB this follows the WARC
    record walk: both kernels are per-file maps, so WARC → HTML → text
    is one shuffle-free stage chain."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for mid, content in zip(pdf_batch[id_col], pdf_batch[content_col]):
                title, text, n_links = _extract_html(
                    content if content is not None else ""
                )
                rows.append((int(mid), title, text, n_links))
            yield pd.DataFrame(
                rows, columns=["media_id", "title", "text", "n_links"]
            )

    src = spread_for_compute(df.select(id_col, content_col), id_col)
    return src.mapInPandas(kernel, schema=HTML_TEXT_SCHEMA)


# ---------------------------------------------------------------------------
# Real robots.txt evaluation (stdlib urllib.robotparser) — crawl
# politeness, the gate before any fetch stage.
# ---------------------------------------------------------------------------

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("url_id", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("allowed", T.BooleanType()),
    ]
)


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    id_col: str = "url_id",
    host_col: str = "host",
    rules_col: str = "robots_txt",
) -> DataFrame:
    """Evaluate each URL against its host's robots.txt with the REAL
    stdlib parser (urllib.robotparser — correct precedence, wildcards
    per RFC 9309 as implemented there). ``urls`` equi-joins ``robots``
    on host (rules rows are one-per-domain — tiny next to the URL side,
    so AQE broadcasts them), then one Arrow map evaluates; parsers are
    cached per host within each batch, so the per-URL cost is one
    ``can_fetch``. Hosts with no robots row default to allowed (the
    crawling convention)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from urllib.robotparser import RobotFileParser

        for pdf_batch in batches:
            cache: dict[str, RobotFileParser | None] = {}
            rows = []
            for uid, url, host, rules in zip(
                pdf_batch[id_col], pdf_batch[url_col],
                pdf_batch[host_col], pdf_batch[rules_col],
            ):
                if host not in cache:
                    if rules is None:
                        cache[host] = None
                    else:
                        p = RobotFileParser()
                        p.parse(str(rules).splitlines())
                        cache[host] = p
                p = cache[host]
                allowed = True if p is None else p.can_fetch(agent, str(url))
                rows.append((int(uid), host, bool(allowed)))
            yield pd.DataFrame(rows, columns=["url_id", "host", "allowed"])

    joined = urls.join(robots, on=host_col, how="left").select(
        id_col, url_col, host_col, rules_col
    )
    src = spread_for_compute(joined, id_col)
    return src.mapInPandas(kernel, schema=ROBOTS_SCHEMA)


# ---------------------------------------------------------------------------
# Real charset sniffing (BOM detection + strict decode attempts) — the
# step before any text op when ingesting raw crawl bytes.
# ---------------------------------------------------------------------------

CHARSET_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("encoding", T.StringType()),
        T.StructField("clean_decode", T.BooleanType()),
        T.StructField("text_prefix", T.StringType()),
    ]
)


def sniff_decode_text(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    prefix_chars: int = 32,
) -> DataFrame:
    """Detect encoding and decode: BOMs first (UTF-8-sig, UTF-16 LE/BE),
    then a STRICT utf-8 attempt, then the latin-1 total fallback (every
    byte maps, so ``clean_decode`` is False to flag the guess). These
    are real ``bytes.decode`` calls, not length heuristics — the
    decode-or-fallback policy every web-ingest pipeline needs before
    text ops. One Arrow map, no shuffle."""

    def _sniff(buf: bytes):
        if buf.startswith(b"\xef\xbb\xbf"):
            return "utf-8-sig", True, buf[3:].decode("utf-8", "replace")
        if buf.startswith(b"\xff\xfe"):
            return "utf-16-le", True, buf[2:].decode("utf-16-le", "replace")
        if buf.startswith(b"\xfe\xff"):
            return "utf-16-be", True, buf[2:].decode("utf-16-be", "replace")
        try:
            return "utf-8", True, buf.decode("utf-8", "strict")
        except UnicodeDecodeError:
            return "latin-1", False, buf.decode("latin-1")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for mid, content in zip(pdf_batch[id_col], pdf_batch[content_col]):
                enc, clean, text = _sniff(
                    bytes(content) if content is not None else b""
                )
                rows.append((int(mid), enc, clean, text[:prefix_chars]))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "encoding", "clean_decode", "text_prefix"],
            )

    src = spread_for_compute(df.select(id_col, content_col), id_col)
    return src.mapInPandas(kernel, schema=CHARSET_SCHEMA)
