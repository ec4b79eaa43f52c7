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


def synth_simple_pdf(page_texts: list[str]) -> bytes:
    """A syntactically complete N-page PDF (catalog, page tree, one
    Flate content stream per page, xref, trailer) drawing each page's
    text with the built-in Helvetica — valid input for pdfplumber AND
    for :func:`_stdlib_pdf_pages`."""
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
        esc = (
            text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        )
        stream = zlib.compress(
            f"BT /F1 12 Tf 72 720 Td ({esc}) Tj ET".encode()
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


def _stdlib_pdf_pages(content: bytes) -> list[str]:
    """REAL extractor for the simple PDF subset: walks content streams
    (raw or FlateDecode), pulls literal strings shown via ``Tj`` / ``TJ``
    and unescapes them; each content stream that shows text is one page
    (true for the one-stream-per-page layout every simple generator
    emits). Raises ValueError when the file is not a PDF — poison
    policy belongs to the caller, exactly like the PNG kernel."""
    import re
    import zlib

    if not content.startswith(b"%PDF"):
        raise ValueError("not a PDF")
    pages: list[str] = []
    for m in re.finditer(
        rb"<<(?P<dict>[^>]*)>>\s*stream\r?\n(?P<body>.*?)endstream",
        content,
        re.DOTALL,
    ):
        body = m.group("body").rstrip(b"\r\n")
        if b"FlateDecode" in m.group("dict"):
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        shown = re.findall(rb"\(((?:\\.|[^\\()])*)\)\s*(?:Tj|'|\")", body)
        shown += [
            s
            for arr in re.findall(rb"\[((?:[^\]\\]|\\.)*)\]\s*TJ", body)
            for s in re.findall(rb"\(((?:\\.|[^\\()])*)\)", arr)
        ]
        if not shown:
            continue
        page = "".join(
            s.decode("latin-1")
            .replace(r"\(", "(")
            .replace(r"\)", ")")
            .replace(r"\\", "\\")
            for s in shown
        )
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
