"""Real-decoder integration tests for the injectable kernel seams
(U1 pdfplumber, multimodal Pillow). This container has neither library,
so these SKIP here — they exist to prove the seams work unmodified the
moment an environment provides the real decoders. The fixtures are
hand-rolled valid files (a minimal one-page PDF with a correct xref, a
zlib-only grayscale PNG) so no generator library is needed either."""

from __future__ import annotations

import os
import struct
import zlib

import pytest


def _minimal_pdf(text: str = "Hello Spark Engine") -> bytes:
    """A syntactically complete one-page PDF (header, 5 objects, xref,
    trailer) whose page stream draws ``text`` with the built-in
    Helvetica — enough for pdfminer/pdfplumber to extract it."""
    stream = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode()
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length "
        + str(len(stream)).encode()
        + b" >>\nstream\n"
        + stream
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _minimal_png(width: int = 8, height: int = 4) -> tuple[bytes, float]:
    """An 8-bit grayscale PNG built with zlib + struct only. Pixel at
    (row r, col c) has value 10*r + c, so the expected mean luma is
    exact. Returns (png_bytes, mean_luma)."""

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    raw = b""
    total = 0
    for r in range(height):
        raw += b"\x00"  # filter type 0 (None) per scanline
        for c in range(width):
            v = 10 * r + c
            raw += bytes([v])
            total += v
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    return png, total / (width * height)


def test_u1_with_real_pdfplumber(spark):
    """U1 end-to-end through the DEFAULT decoder resolution: with
    pdfplumber importable, extract_pdf_text must pick the real kernel
    (no extractor= injection) and return the actual page text."""
    pytest.importorskip("pdfplumber")
    from mcyj_datapipeline_spark.operators.procedural import extract_pdf_text

    pdf = _minimal_pdf("Hello Spark Engine")
    df = spark.createDataFrame([("sha-1", bytearray(pdf))], ["sha256", "content"])
    rows = extract_pdf_text(df).collect()
    assert len(rows) == 1
    pages = rows[0]["text"]
    assert len(pages) == 1
    assert "Hello Spark Engine" in pages[0]


def test_image_features_with_real_pillow(spark):
    """Strict mode must resolve to the real Pillow decoder and produce
    exact geometry + mean luma for a known grayscale PNG."""
    pytest.importorskip("PIL")
    from mcyj_datapipeline_spark.operators import multimodal as MM

    png, expected_luma = _minimal_png(8, 4)
    df = spark.createDataFrame([(1, bytearray(png))], ["media_id", "content"])
    rows = MM.extract_image_features(df, strict=True).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["width"], r["height"]) == (8, 4)
    assert abs(r["mean_luma"] - expected_luma) < 1e-9


def test_fixtures_are_wellformed():
    """The fixtures themselves must stay structurally sound even where
    the decoders are absent (this always runs): PDF has header, xref,
    and trailer; PNG chunk CRCs verify."""
    pdf = _minimal_pdf()
    assert pdf.startswith(b"%PDF-1.4")
    assert b"xref" in pdf and b"%%EOF" in pdf
    start = int(pdf.rsplit(b"startxref\n", 1)[1].split(b"\n", 1)[0])
    assert pdf[start : start + 4] == b"xref"

    png, luma = _minimal_png(8, 4)
    assert png.startswith(b"\x89PNG")
    pos = 8
    tags = []
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos : pos + 4])
        tag = png[pos + 4 : pos + 8]
        payload = png[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", png[pos + 8 + ln : pos + 12 + ln])
        assert crc == zlib.crc32(tag + payload) & 0xFFFFFFFF
        tags.append(tag)
        pos += 12 + ln
    assert tags == [b"IHDR", b"IDAT", b"IEND"]
    # Decompressed scanlines: height*(1+width) bytes, filter 0 rows.
    ihdr = png[16:29]
    w, h = struct.unpack(">II", ihdr[:8])
    raw = zlib.decompress(_idat_payload(png))
    assert len(raw) == h * (1 + w)
    assert luma == sum(b for i, b in enumerate(raw) if i % (w + 1) != 0) / (w * h)


def _idat_payload(png: bytes) -> bytes:
    pos = 8
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos : pos + 4])
        tag = png[pos + 4 : pos + 8]
        if tag == b"IDAT":
            return png[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raise AssertionError("no IDAT")


# ---------------------------------------------------------------------------
# WAV: the one REAL (non-stub) decoder — stdlib struct + numpy, no
# external library, so these do NOT skip.
# ---------------------------------------------------------------------------


def test_wav_decode_roundtrip_and_poison(spark):
    import numpy as np

    from mcyj_datapipeline_spark.operators.multimodal import (
        decode_wav_features,
        synth_pcm16_wav,
    )

    good = synth_pcm16_wav(1600, 16000, 1000)
    df = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(b"not a riff file")),      # poison blob
            (3, bytearray(good[:20])),               # truncated container
            (4, None),                               # null content
        ],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in decode_wav_features(df).collect()}
    ok = rows[1]
    assert (ok["sample_rate"], ok["n_channels"], ok["n_samples"]) == (16000, 1, 1600)
    assert abs(ok["duration_s"] - 0.1) < 1e-12
    assert abs(ok["rms"] - 1000.0) < 1e-9   # alternating ±A → RMS == A
    assert ok["peak"] == 1000
    for bad in (2, 3, 4):
        assert rows[bad]["sample_rate"] is None  # null-stats, not a crash


def test_wav_decode_agrees_with_stdlib_wave(spark):
    """Cross-validate the RIFF parser against Python's independent
    stdlib `wave` implementation on the same bytes."""
    import io
    import wave

    from mcyj_datapipeline_spark.operators.multimodal import (
        decode_wav_features,
        synth_pcm16_wav,
    )

    blob = synth_pcm16_wav(777, 8000, 321)
    w = wave.open(io.BytesIO(blob))
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, content binary"
    )
    got = decode_wav_features(df).collect()[0]
    assert got["sample_rate"] == w.getframerate()
    assert got["n_channels"] == w.getnchannels()
    assert got["n_samples"] == w.getnframes()


# ---------------------------------------------------------------------------
# PNG: real stdlib decoder (zlib inflate + scanline unfilter) — does
# not skip either.
# ---------------------------------------------------------------------------


def test_png_decode_all_filter_types():
    """Unit-level: hand-encoded scanlines for every PNG filter type
    recover the intended pixels."""
    import struct
    import zlib

    from mcyj_datapipeline_spark.operators.multimodal import _png_decode_image

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d))
        )

    # 3x5 image, pixels row r = [r*10+1, r*10+2, r*10+3], one row per
    # filter type 0..4 encoded accordingly.
    rows = [[r * 10 + 1, r * 10 + 2, r * 10 + 3] for r in range(5)]
    enc = bytearray()
    prev = [0, 0, 0]
    for r, px in enumerate(rows):
        f = r  # filter type == row index
        enc.append(f)
        for x in range(3):
            a = px[x - 1] if x else 0
            b = prev[x]
            c = prev[x - 1] if x else 0
            if f == 0:
                enc.append(px[x])
            elif f == 1:
                enc.append((px[x] - a) & 0xFF)
            elif f == 2:
                enc.append((px[x] - b) & 0xFF)
            elif f == 3:
                enc.append((px[x] - ((a + b) >> 1)) & 0xFF)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc.append((px[x] - pred) & 0xFF)
        prev = px
    ihdr = struct.pack(">IIBBBBB", 3, 5, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(enc)))
        + chunk(b"IEND", b"")
    )
    w, h, mean = _png_decode_image(png)
    flat = [v for row in rows for v in row]
    assert (w, h) == (3, 5)
    assert abs(mean - sum(flat) / len(flat)) < 1e-12


def test_png_decode_rejects_non_png():
    import pytest as _pytest

    from mcyj_datapipeline_spark.operators.multimodal import _png_decode_image

    with _pytest.raises(ValueError):
        _png_decode_image(b"GIF89a not a png")


# ---------------------------------------------------------------------------
# PDF: real stdlib extractor for the simple subset (Flate/raw streams,
# literal-string Tj/TJ) — does not skip.
# ---------------------------------------------------------------------------


def test_pdf_stdlib_extract_multipage_and_escapes():
    from mcyj_datapipeline_spark.operators.procedural import (
        _stdlib_pdf_pages,
        synth_simple_pdf,
    )

    texts = ["Hello (world)", "Back\\slash page", "Plain third"]
    assert _stdlib_pdf_pages(synth_simple_pdf(texts)) == texts


def test_pdf_stdlib_extract_rejects_non_pdf():
    import pytest as _pytest

    from mcyj_datapipeline_spark.operators.procedural import _stdlib_pdf_pages

    with _pytest.raises(ValueError):
        _stdlib_pdf_pages(b"%PNG nope")


def test_pdf_stdlib_agrees_with_pdfplumber_if_present():
    pdfplumber = pytest.importorskip("pdfplumber")
    import io

    from mcyj_datapipeline_spark.operators.procedural import (
        _stdlib_pdf_pages,
        synth_simple_pdf,
    )

    texts = ["Cross check one", "Cross check two"]
    blob = synth_simple_pdf(texts)
    with pdfplumber.open(io.BytesIO(blob)) as pdf:
        ref = [p.extract_text() or "" for p in pdf.pages]
    assert _stdlib_pdf_pages(blob) == ref == texts


# ---------------------------------------------------------------------------
# HTML: real stdlib extractor — does not skip.
# ---------------------------------------------------------------------------


def test_html_extract_entities_blocks_inline_and_poison():
    from mcyj_datapipeline_spark.operators.procedural import _extract_html

    title, text, n_links = _extract_html(
        "<html><head><title>A&amp;B</title><script>var s='<p>x</p>';</script>"
        "</head><body><h1>H</h1><p>un<b>usual</b> &lt;word&gt;</p>"
        "<a href=a>l1</a><a href=b>l2</a><noscript>no</noscript></body>"
    )
    assert title == "A&B"
    assert text == "H unusual <word> l1l2"  # inline <a> never splits
    assert n_links == 2
    # malformed: unclosed everything, still best-effort
    _, poison_text, _ = _extract_html("<div><p>ok <b>still")
    assert poison_text == "ok still"
    # empty input
    assert _extract_html("") == ("", "", 0)


def test_robots_filter_missing_rules_defaults_to_allowed(spark):
    from mcyj_datapipeline_spark.operators.procedural import robots_filter

    urls = spark.createDataFrame(
        [
            (1, "a.io", "http://a.io/private/x"),
            (2, "norules.io", "http://norules.io/private/x"),
        ],
        "url_id long, host string, url string",
    )
    robots = spark.createDataFrame(
        [("a.io", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string",
    )
    got = {r["url_id"]: r["allowed"] for r in robots_filter(urls, robots).collect()}
    assert got == {1: False, 2: True}


def test_charset_sniff_edges(spark):
    from mcyj_datapipeline_spark.operators.procedural import sniff_decode_text

    df = spark.createDataFrame(
        [
            (1, bytearray(b"")),                      # empty: utf-8, clean
            (2, bytearray(b"\xfe\xff\x00A")),          # UTF-16-BE BOM
            (3, None),                                 # null content
        ],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in sniff_decode_text(df).collect()}
    assert (rows[1]["encoding"], rows[1]["clean_decode"]) == ("utf-8", True)
    assert rows[2]["encoding"] == "utf-16-be" and rows[2]["text_prefix"] == "A"
    assert rows[3]["encoding"] == "utf-8" and rows[3]["text_prefix"] == ""


def test_frontier_schedule_missing_host_and_fractional_delay(spark):
    """Regression: hosts absent from the delay table keep their URLs
    (default delay), and fractional delays preserve spacing instead of
    truncating to the same integer second."""
    from mcyj_datapipeline_spark.operators.temporal import frontier_schedule

    urls = spark.createDataFrame(
        [(1, "a.io"), (2, "a.io"), (3, "a.io"), (4, "nodelay.io")],
        "url_id long, host string",
    )
    delays = spark.createDataFrame(
        [("a.io", 0.5)], "host string, crawl_delay_s double"
    )
    rows = {r["url_id"]: r["fetch_at_s"] for r in frontier_schedule(urls, delays).collect()}
    assert rows[4] == 0.0          # unknown host scheduled, not dropped
    assert (rows[1], rows[2], rows[3]) == (0.0, 0.5, 1.0)  # spacing kept


# ---------------------------------------------------------------------------
# PDF advanced subset: page-tree walk, multi-stream pages, PNG
# predictors, hex strings, octal escapes — the shapes real
# Word/Adobe-produced files (the reference corpus's provenance) emit.
# ---------------------------------------------------------------------------


def test_pdf_advanced_multistream_predictor_hex_octal():
    from mcyj_datapipeline_spark.operators.procedural import (
        _stdlib_pdf_pages,
        synth_advanced_pdf,
    )

    texts = [
        "Page one is split across two content streams, stream B "
        "rides FlateDecode + PNG Predictor 12.",
        "Smart ’quotes” and bullets • go hex UTF-16BE",
        "Plain (escaped) third \\ page",
    ]
    blob = synth_advanced_pdf(texts)
    # structural sanity: the features are really in the file
    assert b"/Contents [5 0 R 6 0 R]" in blob
    assert b"/Predictor 12" in blob
    assert _stdlib_pdf_pages(blob) == texts


def test_pdf_literal_escape_decoding():
    from mcyj_datapipeline_spark.operators.procedural import (
        _pdf_decode_literal,
    )

    assert _pdf_decode_literal(rb"a\(b\)c\\d") == "a(b)c\\d"
    assert _pdf_decode_literal(rb"\110\151!") == "Hi!"  # octal
    assert _pdf_decode_literal(rb"tab\there") == "tab\there"
    assert _pdf_decode_literal(b"line\\\ncont") == "linecont"  # continuation
    assert _pdf_decode_literal(rb"\7bell") == "\x07bell"  # short octal


def test_pdf_hex_string_decoding():
    from mcyj_datapipeline_spark.operators.procedural import _pdf_decode_hex

    assert _pdf_decode_hex(b"48 65 6C 6C 6F") == "Hello"
    assert _pdf_decode_hex(b"48656") == "He`"  # odd digit -> trailing 0
    bom16 = (b"\xfe\xff" + "d’accord".encode("utf-16-be")).hex().encode()
    assert _pdf_decode_hex(bom16) == "d’accord"


def test_png_predictor_roundtrip():
    from mcyj_datapipeline_spark.operators.procedural import (
        _png_predict_encode,
        _png_unpredict,
    )

    data = bytes(range(7, 250)) * 3
    cols = 16
    enc = _png_predict_encode(data, cols)
    dec = _png_unpredict(enc, cols)
    pad = (-len(data)) % cols
    assert dec == data + b" " * pad


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/pdf_parsing/parquet_files"),
    reason="reference pdf_parsing snapshot not present",
)
def test_pdf_stdlib_roundtrips_all_real_reference_texts():
    """The reference snapshot commits NO pdf bytes (Downloads/ is not
    in the repo — only the extracted text parquet), so byte-equality
    against a real committed PDF is impossible by construction. The
    strongest available substitute: run every one of the 596 REAL
    production documents' page texts through the synth PDF writers
    (both the simple layout and the advanced Word-shaped layout:
    multi-stream pages, Predictor-12 Flate, hex/octal strings) and
    require the stdlib extractor to reproduce every page EXACTLY.
    596/596 at authoring time; any regression fails."""
    import glob

    import pyarrow.parquet as pq

    from mcyj_datapipeline_spark.operators.procedural import (
        _stdlib_pdf_pages,
        synth_advanced_pdf,
        synth_simple_pdf,
    )

    n = simple_ok = adv_ok = 0
    for f in sorted(
        glob.glob("/root/reference/pdf_parsing/parquet_files/*.parquet")
    ):
        for pages in pq.read_table(f).column("text").to_pylist():
            n += 1
            simple_ok += _stdlib_pdf_pages(synth_simple_pdf(pages)) == pages
            adv_ok += _stdlib_pdf_pages(synth_advanced_pdf(pages)) == pages
    assert n == 596
    assert simple_ok == n, f"simple layout: {simple_ok}/{n}"
    assert adv_ok == n, f"advanced layout: {adv_ok}/{n}"


def _gradient_png(width: int, height: int, step: int, noise: int = 0) -> bytes:
    """8-bit grayscale PNG with a horizontal gradient (value = x*step,
    clamped), optional tiny per-row brightness offset to emulate a
    re-encode — filter type 0 rows, single IDAT."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    raw = b""
    for y in range(height):
        row = bytes(
            min(255, x * step + (noise if y % 2 else 0))
            for x in range(width)
        )
        raw += b"\x00" + row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_dhash_real_png_near_dup_vs_distinct():
    """The REAL dHash path (stdlib PNG decode -> block-mean 9x8 grid):
    a re-encoded near-copy of a gradient (tiny brightness jitter) must
    land within a small hamming radius of the original, while a
    reversed gradient must sit far away — the perceptual property the
    hash exists for. Brightness invariance: a globally +40 shifted
    copy hashes IDENTICALLY (dHash compares neighbors, not levels)."""
    from mcyj_datapipeline_spark.operators.multimodal import (
        _dhash_from_grid,
        _png_grid_decoder,
    )

    base = _dhash_from_grid(_png_grid_decoder(_gradient_png(36, 32, 6)))
    jitter = _dhash_from_grid(
        _png_grid_decoder(_gradient_png(36, 32, 6, noise=2))
    )
    reverse = _dhash_from_grid(
        _png_grid_decoder(_reverse_gradient_png(36, 32, 6))
    )
    shifted = _dhash_from_grid(
        _png_grid_decoder(_shifted_gradient_png(36, 32, 6, 40))
    )

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(base, jitter) <= 4, ham(base, jitter)
    assert ham(base, reverse) >= 32, ham(base, reverse)
    assert shifted == base


def _reverse_gradient_png(width: int, height: int, step: int) -> bytes:
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    raw = b""
    for _y in range(height):
        row = bytes(
            min(255, (width - 1 - x) * step) for x in range(width)
        )
        raw += b"\x00" + row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _shifted_gradient_png(width: int, height: int, step: int, shift: int) -> bytes:
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    raw = b""
    for _y in range(height):
        row = bytes(
            min(255, x * step + shift) for x in range(width)
        )
        raw += b"\x00" + row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_dhash_spark_pipeline_finds_planted_image_pair(spark):
    """End-to-end through the Spark operators: plant two near-identical
    real PNGs among distinct ones; image_dhash (real stdlib path) +
    dhash_near_pairs must surface exactly the planted pair."""
    from mcyj_datapipeline_spark.operators.multimodal import (
        dhash_near_pairs,
        image_dhash,
    )

    # NOTE: no "flatter ramp" decoy — dHash is contrast-invariant by
    # design, so ANY monotone-increasing gradient hashes identically to
    # the base (that's the feature, not a bug); the far image must
    # differ in gradient DIRECTION, as the reversed ramp does.
    rows = [
        (1, _gradient_png(36, 32, 6)),
        (2, _gradient_png(36, 32, 6, noise=2)),  # near-copy of 1
        (3, _reverse_gradient_png(36, 32, 6)),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    hashes = image_dhash(df)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_near_pairs(hashes, max_hamming=4).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 4
    assert all(p == (1, 2) for p in pairs), pairs


def test_audio_fingerprint_real_wav_near_dup_and_loudness_invariance(
    spark,
):
    """The REAL audio path (stdlib PCM16 framing): a half-volume copy
    of a clip fingerprints IDENTICALLY (sign-of-delta is loudness
    invariant), a lightly-noised re-encode lands within hamming 4, and
    a different melody sits far away; the Spark pipeline surfaces
    exactly the planted near-group."""
    import math
    import struct

    from mcyj_datapipeline_spark.operators.multimodal import (
        audio_fingerprint,
        dhash_near_pairs,
    )

    def wav(samples):
        payload = b"".join(
            struct.pack("<h", max(-32768, min(32767, int(s))))
            for s in samples
        )
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    rng_phase = lambda i: math.sin(i / 50.0) * math.sin(i / 700.0)
    melody_a = [12000 * rng_phase(i) for i in range(8000)]
    half_volume = [s * 0.5 for s in melody_a]
    noised = [s + ((i * 37) % 13 - 6) * 8 for i, s in enumerate(melody_a)]
    melody_b = [
        12000 * math.sin(i / 9.0) * math.cos(i / 301.0) for i in range(8000)
    ]

    df = spark.createDataFrame(
        [
            (1, wav(melody_a)),
            (2, wav(half_volume)),
            (3, wav(noised)),
            (4, wav(melody_b)),
        ],
        "media_id long, content binary",
    )
    fps = {r["media_id"]: r["afp"] for r in audio_fingerprint(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert fps[1] == fps[2], "loudness invariance broken"
    assert ham(fps[1], fps[3]) <= 4, ham(fps[1], fps[3])
    assert ham(fps[1], fps[4]) > 10, ham(fps[1], fps[4])

    pairs = {
        (r["id_a"], r["id_b"])
        for r in dhash_near_pairs(
            audio_fingerprint(df), max_hamming=4, hash_col="afp"
        ).collect()
    }
    assert {(1, 2), (1, 3), (2, 3)} <= pairs
    assert not any(4 in p for p in pairs), pairs
