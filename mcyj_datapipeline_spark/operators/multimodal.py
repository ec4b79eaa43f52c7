"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBBED (this environment has no
image/audio libraries): each kernel either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
derived from the bytes (test mode), but the Spark-side plumbing —
schemas, batch iteration, partitioning, UDF signatures — is real and
tested. Swapping a real decoder in changes only the inner function.

Scale notes: media blobs ride in parquet binary columns; partitioning
is by size (``repartition`` on a size-bucketed key) so one straggler
video doesn't serialize a whole partition; the Arrow batch size is the
memory knob (``spark.sql.execution.arrow.maxRecordsPerBatch``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mcyj_datapipeline_spark.operators.partitioning import spread_for_compute

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def _fake_decode_image(content: bytes) -> tuple[int, int, float]:
    """Deterministic fake decoder: derives (width, height, mean_luma)
    from the byte content. STUB — replace with PIL/turbojpeg in prod."""
    n = len(content)
    width = 16 + (n % 241)
    height = 16 + ((n * 31) % 241)
    luma = (sum(content[:256]) % 25600) / 100.0 if n else 0.0
    return width, height, luma


def _pil_decode_image(content: bytes) -> tuple[int, int, float]:
    """Real decoder via Pillow: (width, height, mean 8-bit luma) from
    the grayscale histogram — O(1) memory per image after decode."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(content)) as im:
        g = im.convert("L")
        w, h = g.size
        hist = g.histogram()
        total = sum(v * cnt for v, cnt in enumerate(hist))
        return w, h, total / (w * h)


def extract_image_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    strict: bool = False,
    decoder=None,
) -> DataFrame:
    """Decode/feature-extract over binary image column via mapInPandas.
    One input row → one output row; Arrow batches carry the bytes.

    Decoder resolution (same injectable seam as U1's pdfplumber):
    explicit ``decoder`` wins; else Pillow if importable ON THE
    EXECUTOR (resolved inside the kernel, not the driver — at cluster
    scale the two environments differ); else the deterministic fake —
    unless ``strict=True``, which refuses to silently fake and raises
    ``NotImplementedError`` when no real decoder exists."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = decoder
        if decode is None:
            try:
                import PIL  # noqa: F401

                decode = _pil_decode_image
            except ImportError:
                if strict:
                    raise NotImplementedError(
                        "strict image decode requires Pillow (or an "
                        "explicit decoder=) — not in this env"
                    )
                decode = _fake_decode_image
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                content = bytes(content) if content is not None else b""
                w, h, luma = decode(content)
                rows.append((int(mid), len(content), w, h, luma))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "width", "height", "mean_luma"]
            )

    src = spread_for_compute(df.select(id_col, content_col), id_col)
    return src.mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling plumbing: one input "video" row → N output frame
    rows (1:N mapInPandas, the generator/UDTF shape). The fake splitter
    chunks bytes; a real one would demux with pyav."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                content = bytes(content) if content is not None else b""
                chunk = max(1, every_n)
                for idx, off in enumerate(range(0, len(content), chunk * 16)):
                    rows.append((int(mid), idx, content[off : off + 16]))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "frame_bytes"]
            )

    src = spread_for_compute(df.select(id_col, content_col), id_col)
    return src.mapInPandas(kernel, schema=FRAME_SAMPLE_SCHEMA)


def with_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata columns computed JVM-side (no decode needed):
    byte length, sha256 content id, magic-number format sniff."""
    c = F.col(content_col)
    magic = F.hex(F.substring(c, 1, 4))
    return df.withColumn("n_bytes", F.length(c)).withColumn(
        "content_sha", F.sha2(c, 256)
    ).withColumn(
        "format_sniff",
        F.when(magic.startswith("FFD8"), "jpeg")
        .when(magic.startswith("89504E47"), "png")
        .when(magic.startswith("25504446"), "pdf")
        .otherwise("unknown"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("src_bytes", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("n_windows", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    target: tuple[int, int] = (32, 32),
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Resize plumbing (1:1 mapInPandas, binary in → binary out): the
    fake "resampler" emits a deterministic target-sized byte grid
    derived by striding the source bytes. STUB — a real kernel swaps in
    PIL/cv2; schema, batching, and output-size contract stay identical."""
    tw, th = target

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                src = bytes(content) if content else b"\x00"  # None OR b""
                n = tw * th
                stride = max(1, len(src) // n)
                out = bytes(src[(i * stride) % len(src)] for i in range(n))
                # src_bytes emitted here keeps the consumer ONE pass —
                # joining the source back for its length would rescan it.
                # None propagates as SQL NULL (octet_length(NULL) = NULL),
                # not 0 — matches the oracle's NULL-propagation semantics.
                n_src = len(bytes(content)) if content is not None else None
                rows.append((int(mid), tw, th, n_src, out))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "out_width", "out_height", "src_bytes",
                    "resized",
                ],
            )

    src = spread_for_compute(df.select(id_col, content_col), id_col)
    return src.mapInPandas(kernel, schema=RESIZED_SCHEMA)


def extract_audio_features(
    df: DataFrame,
    bytes_per_second: int = 16_000,
    window_s: float = 0.5,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Audio feature plumbing: duration + analysis-window count derived
    from byte length at a nominal rate. STUB decode (no soundfile/ffmpeg
    in this env) — deterministic arithmetic keeps it oracle-checkable.
    Duration is returned UNROUNDED: Python's round() is half-even while
    SQL round() is half-up, so presentation rounding belongs to the
    caller's column expression, not the kernel."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                n = len(bytes(content)) if content is not None else 0
                dur = n / bytes_per_second
                rows.append((int(mid), n, dur, int(math.ceil(dur / window_s))))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "duration_s", "n_windows"]
            )

    src = spread_for_compute(df.select(id_col, content_col), id_col)
    return src.mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# Real WAV decode (stdlib-only: RIFF parse + numpy PCM) — unlike the
# image/ffmpeg kernels above, audio needs no external library for the
# PCM case, so this one is NOT a stub.
# ---------------------------------------------------------------------------

WAV_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.LongType()),
    ]
)


def synth_pcm16_wav(n_samples: int, sample_rate: int, amplitude: int) -> bytes:
    """Minimal valid mono PCM16 WAV whose signal alternates ±amplitude —
    chosen so RMS == amplitude and peak == amplitude EXACTLY, which is
    what lets a real decoder carry a full value oracle."""
    import struct

    import numpy as np

    samples = np.full(n_samples, amplitude, dtype="<i2")
    samples[1::2] *= -1
    payload = samples.tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate,
        sample_rate * 2, 2, 16,
    )
    data = struct.pack("<4sI", b"data", len(payload)) + payload
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
    return riff + fmt + data


def decode_wav_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL audio decode for PCM16 WAV: RIFF chunk walk (struct), sample
    extraction (numpy ``frombuffer``), RMS/peak over float64. Arrow
    mapInPandas — one batch in, one stats row per file out; malformed or
    non-PCM files yield a null-stats row instead of failing the stage
    (at 100 TB a poison blob must not kill the job)."""

    def _decode(buf: bytes):
        import struct

        import numpy as np

        if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
            return None
        pos, rate, channels, bits, payload = 12, None, None, None, None
        while pos + 8 <= len(buf):
            cid, size = struct.unpack("<4sI", buf[pos:pos + 8])
            body = buf[pos + 8:pos + 8 + size]
            # guard on ACTUAL body length, not the declared size —
            # truncated containers lie about size
            if cid == b"fmt " and len(body) >= 16:
                audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
                bits = struct.unpack("<H", body[14:16])[0]
                if audio_fmt != 1:  # PCM only
                    return None
            elif cid == b"data":
                payload = body
            pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
        if rate is None or payload is None or bits != 16 or not channels:
            return None
        samples = np.frombuffer(
            payload[: len(payload) - (len(payload) % 2)], dtype="<i2"
        )
        n = len(samples) // channels
        if n == 0:
            return rate, channels, 0, 0.0, 0.0, 0
        x = samples.astype("f8")
        return (
            rate,
            channels,
            n,
            n / rate,
            float(np.sqrt(np.mean(x * x))),
            int(np.max(np.abs(samples))),
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                out = _decode(bytes(content)) if content is not None else None
                if out is None:
                    rows.append((int(mid), None, None, None, None, None, None))
                else:
                    rows.append((int(mid), *out))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_channels", "n_samples",
                    "duration_s", "rms", "peak",
                ],
            )

    src = spread_for_compute(df.select(id_col, content_col), id_col)
    return src.mapInPandas(kernel, schema=WAV_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# Real grayscale-PNG decode (stdlib-only: zlib inflate + scanline
# unfilter). Like the WAV kernel, no external library is required for
# this subset, so it is NOT a stub — pass it as ``decoder=`` to
# :func:`extract_image_features` (the auto path still prefers Pillow,
# which handles every other format).
# ---------------------------------------------------------------------------


def synth_gray_png(width: int, height: int, value: int) -> bytes:
    """Minimal valid 8-bit grayscale PNG with every pixel == ``value`` —
    constant image, so mean luma == value EXACTLY (the closed form the
    value oracle needs)."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = (b"\x00" + bytes([value]) * width) * height  # filter 0 rows
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_gray_pixels(content: bytes) -> tuple[int, int, list]:
    """REAL decoder core for 8-bit grayscale PNG: chunk walk, zlib
    inflate, full scanline unfilter (all five PNG filter types);
    returns (width, height, rows-of-pixel-bytearrays). Raises
    ValueError on anything it cannot decode (caller decides poison
    policy). ``_png_decode_image`` and the dHash kernel both build on
    this."""
    import struct
    import zlib

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, None, None, b""
    while pos + 8 <= len(content):
        (size,) = struct.unpack(">I", content[pos:pos + 4])
        ctype = content[pos + 4:pos + 8]
        body = content[pos + 8:pos + 8 + size]
        if ctype == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", body[:10])
            if depth != 8 or color != 0:
                raise ValueError("only 8-bit grayscale supported here")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size  # len + type + crc
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(idat)
    stride = w + 1
    if len(raw) < stride * h:
        raise ValueError("truncated pixel data")
    rows = []
    prev = bytearray(w)
    for y in range(h):
        row = bytearray(raw[y * stride + 1:(y + 1) * stride])
        ftype = raw[y * stride]
        if ftype == 1:  # Sub
            for x in range(1, w):
                row[x] = (row[x] + row[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(w):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(w):
                left = row[x - 1] if x else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(w):
                a = row[x - 1] if x else 0
                b = prev[x]
                c = prev[x - 1] if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter {ftype}")
        rows.append(row)
        prev = row
    return w, h, rows


def _png_decode_image(content: bytes) -> tuple[int, int, float]:
    """Mean-luma features over the real stdlib PNG decode."""
    w, h, rows = _png_gray_pixels(content)
    return w, h, sum(sum(r) for r in rows) / (w * h)


# ---------------------------------------------------------------------------
# Perceptual image dedup: difference hash (dHash) + banded near-pair join
# ---------------------------------------------------------------------------

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def _dhash_from_grid(grid) -> int:
    """64-bit difference hash from a 8-row x 9-column grayscale grid
    (flat list of 72 ints): bit r*8+c set iff cell (r, c+1) is
    brighter than cell (r, c) — the classic gradient-direction
    fingerprint, invariant to global brightness/contrast shifts."""
    h = 0
    for r in range(8):
        for c in range(8):
            if grid[r * 9 + c + 1] > grid[r * 9 + c]:
                h |= 1 << (r * 8 + c)
    # keep inside signed int64 for Spark LongType
    return h - (1 << 64) if h >= (1 << 63) else h


def _png_grid_decoder(content: bytes):
    """REAL grid decoder: stdlib PNG decode, then block-mean resize to
    the 9x8 dHash grid (each cell averages its pixel block — the
    area-style downsample dHash specifies)."""
    w, h, rows = _png_gray_pixels(content)
    grid = []
    for gr in range(8):
        y0, y1 = gr * h // 8, max((gr + 1) * h // 8, gr * h // 8 + 1)
        for gc in range(9):
            x0, x1 = gc * w // 9, max((gc + 1) * w // 9, gc * w // 9 + 1)
            acc = n = 0
            for y in range(y0, min(y1, h)):
                row = rows[y]
                for x in range(x0, min(x1, w)):
                    acc += row[x]
                    n += 1
            grid.append(acc // max(n, 1))
    return grid


def _fake_grid_decoder(content: bytes):
    """Deterministic stand-in grid for non-image bytes (closed-form in
    octet_length, so registry oracles re-derive it arithmetically —
    the mm_image_features convention)."""
    n = len(content)
    return [(n * 7 + i * 13) % 251 for i in range(72)]


def _fake_grid_decoder_id(content: bytes, media_id: int):
    """Id-aware fake grid with PLANTED near-dups: ids 0/1 mod 100
    share a seed (so each hundred-block contributes one exact pair),
    everything else scatters via a quadratic-residue pattern — a
    linear fake's constant delta pattern makes every hash
    near-identical (observed: ~11k pairs over 500 docs), which
    benchmarks nothing. Closed form in (octet_length, media_id) so
    the oracle stays arithmetic."""
    n = len(content)
    seed = media_id - (media_id % 100) if media_id % 100 < 2 else media_id
    return [
        ((n + seed * 31) * (i * i + 3 * i + 7)) % 251 for i in range(72)
    ]


def image_dhash(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    grid_decoder=None,
) -> DataFrame:
    """Per-image 64-bit dHash via Arrow mapInPandas (1:1). The grid
    decoder is the injectable seam: explicit wins, else the stdlib PNG
    path for real grayscale PNGs, else the deterministic fake — same
    resolution policy as :func:`extract_image_features`."""

    import inspect

    # Count REQUIRED parameters only (the audio_fingerprint form,
    # ADVICE r6): counting all parameters miscalled a decoder like
    # ``lambda content, n=72`` with (content, media_id), shoving the
    # id into its tuning knob.
    id_aware = (
        grid_decoder is not None
        and sum(
            1
            for p in inspect.signature(grid_decoder).parameters.values()
            if p.default is inspect.Parameter.empty
        )
        >= 2
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = grid_decoder
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                content = bytes(content) if content is not None else b""
                if decode is not None:
                    grid = (
                        decode(content, int(mid))
                        if id_aware
                        else decode(content)
                    )
                else:
                    try:
                        grid = _png_grid_decoder(content)
                    except (ValueError, IndexError):
                        grid = _fake_grid_decoder(content)
                rows.append(
                    (int(mid), len(content), _dhash_from_grid(grid))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "dhash"]
            )

    src = spread_for_compute(df.select(id_col, content_col), id_col)
    return src.mapInPandas(kernel, schema=DHASH_SCHEMA)


def dhash_near_pairs(
    hashes: DataFrame,
    max_hamming: int = 4,
    id_col: str = "media_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """Near-duplicate image pairs: hamming(dhash_a, dhash_b) <=
    ``max_hamming`` via pigeonhole banding — split the 64 bits into
    ``max_hamming + 1`` bands; any pair within the radius must agree
    EXACTLY on at least one band, so candidates come from equi-joins
    on (band_index, band_value) and the full cross join never exists
    (the simhash_near_pairs strategy, applied to perceptual hashes).
    Exact verification by bit_count(xor) keeps the result identical
    to brute force."""
    n_bands = max_hamming + 1
    width = 64 // n_bands
    bands = hashes.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(
                            F.col(hash_col), b * width
                        ).bitwiseAND(
                            F.lit((1 << width) - 1)
                        ).alias("val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_h", "_b.band", "_b.val")
    cands = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "val"])
        .filter(F.col("x._id") < F.col("y._id"))
        .select(
            F.col("x._id").alias("id_a"),
            F.col("y._id").alias("id_b"),
            F.col("x._h").alias("_ha"),
            F.col("y._h").alias("_hb"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming",
            F.bit_count(
                F.col("_ha").bitwiseXOR(F.col("_hb"))
            ).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Audio dedup: frame-energy fingerprint (1-D dHash analog) over PCM16 WAV
# ---------------------------------------------------------------------------

AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("afp", T.LongType()),
    ]
)


def _bits64_from_seq(seq) -> int:
    """64-bit sign-of-delta fingerprint from a 65-value sequence: bit i
    set iff seq[i+1] > seq[i] — loudness-invariant (scaling every
    value preserves every comparison), the property that makes it a
    re-encode-robust audio signature."""
    h = 0
    for i in range(64):
        if seq[i + 1] > seq[i]:
            h |= 1 << i
    return h - (1 << 64) if h >= (1 << 63) else h


def _wav_energy_frames(content: bytes, n_frames: int = 65):
    """REAL path: stdlib RIFF walk (PCM16 only), mono-mix, mean-square
    energy over ``n_frames`` equal time blocks. Raises ValueError on
    anything it cannot decode."""
    import struct

    import numpy as np

    buf = content
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, rate, channels, bits, payload = 12, None, None, None, None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack("<4sI", buf[pos:pos + 8])
        body = buf[pos + 8:pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_fmt != 1:
                raise ValueError("non-PCM WAV")
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)
    if rate is None or payload is None or bits != 16 or not channels:
        raise ValueError("missing fmt/data or not PCM16")
    samples = np.frombuffer(
        payload[: len(payload) - (len(payload) % 2)], dtype="<i2"
    )
    n = len(samples) // channels
    if n < n_frames:
        raise ValueError("too short to frame")
    mono = samples[: n * channels].astype("f8").reshape(n, channels).mean(axis=1)
    edges = [i * n // n_frames for i in range(n_frames + 1)]
    return [
        float((mono[edges[i]:edges[i + 1]] ** 2).mean())
        for i in range(n_frames)
    ]


def _fake_energy_frames(content: bytes, n_frames: int = 65):
    """Deterministic stand-in energies (closed-form in octet_length,
    the registry-oracle convention)."""
    n = len(content)
    return [(n * 11 + i * 17) % 257 for i in range(n_frames)]


def _fake_energy_frames_id(content: bytes, media_id: int, n_frames: int = 65):
    """Id-aware fake energies with planted near-dups (see
    ``_fake_grid_decoder_id`` for the rationale)."""
    n = len(content)
    seed = media_id - (media_id % 100) if media_id % 100 < 2 else media_id
    return [
        ((n + seed * 29) * (i * i + 5 * i + 11)) % 257
        for i in range(n_frames)
    ]


def audio_fingerprint(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    frame_fn=None,
) -> DataFrame:
    """Per-clip 64-bit audio fingerprint via Arrow mapInPandas (1:1):
    sign of the frame-energy delta over 65 equal time blocks. The
    frame extractor is the injectable seam: explicit wins, else the
    real stdlib PCM16 path, else the deterministic fake. Near-dup
    pairs reuse :func:`dhash_near_pairs` (the banded hamming join is
    hash-agnostic)."""

    import inspect

    id_aware = (
        frame_fn is not None
        and sum(
            1
            for p in inspect.signature(frame_fn).parameters.values()
            if p.default is inspect.Parameter.empty
        )
        >= 2
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        extract = frame_fn
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                content = bytes(content) if content is not None else b""
                if extract is not None:
                    frames = (
                        extract(content, int(mid))
                        if id_aware
                        else extract(content)
                    )
                else:
                    try:
                        frames = _wav_energy_frames(content)
                    except (ValueError, IndexError):
                        frames = _fake_energy_frames(content)
                rows.append(
                    (int(mid), len(content), _bits64_from_seq(frames))
                )
            yield pd.DataFrame(rows, columns=["media_id", "n_bytes", "afp"])

    src = spread_for_compute(df.select(id_col, content_col), id_col)
    return src.mapInPandas(kernel, schema=AUDIO_FP_SCHEMA)
