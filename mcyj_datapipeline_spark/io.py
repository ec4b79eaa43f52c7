"""Sources & sinks (SURVEY.md §2.1, operators S1–S9 / K1–K6).

All reads go through ``spark.read`` so Catalyst gets schema pruning and
predicate pushdown into the scan; all multi-file "union of batches"
semantics (reference: glob + per-file read + concat, e.g.
``pdf_parsing/extract_pdf_text.py:50-70``) are native directory reads
here — Spark unions the files in one distributed scan.

Sinks preserve the reference's observable behavior (deterministic order,
header handling, append-only batches) without its single-file
bottlenecks, except where single-file output is the explicit contract
(K1) in which case we ``coalesce(1)`` only at the final write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S3: parquet scan (single file or directory-union of batch files).

    The driver's ``events`` table stores ``ts`` as TIMESTAMP(NANOS),
    which Spark has no type for; with ``nanosAsLong`` the scan yields
    int64 nanos and we normalize to a microsecond timestamp here, at the
    ingestion boundary (SURVEY §1.3: normalize once, never downstream)."""
    if name == "events":
        # Defensive: the scan throws PARQUET_TYPE_ILLEGAL on
        # TIMESTAMP(NANOS) unless this (runtime-settable) conf is on —
        # required when the caller supplies a session our factory didn't
        # build (e.g. the driver harness).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Integer division: ns/1000 through a double would round-drift.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load driver testdata tables by name."""
    use = names or TPCH_TABLES
    return {n: read_table(spark, sf_dir, n) for n in use}


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """S1/S2: header CSV scan. With ``schema`` the read is typed and the
    scan prunes columns; without, Spark infers (header-only string cols,
    matching the reference's ``csv.DictReader`` view of the world,
    ``run_full_pipeline.py:36-41``)."""
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", False)
    return reader.csv(path)


def _ci_glob(glob: str) -> str:
    """Case-insensitivize a plain glob (``*``/``?``/literals) by turning
    each letter into a two-char class: ``report_*.pdf`` →
    ``[rR][eE]...*.[pP][dD][fF]``. Pre-existing ``[]`` classes are not
    supported (the whole point is to generate them)."""
    return "".join(
        f"[{ch.lower()}{ch.upper()}]" if ch.isalpha() else ch for ch in glob
    )


def _glob_regex(glob: str) -> str:
    """Translate a plain glob into an anchored case-insensitive Java
    regex for the filename."""
    import re

    parts = []
    for ch in glob:
        if ch == "*":
            parts.append(".*")
        elif ch == "?":
            parts.append(".")
        else:
            parts.append(re.escape(ch))
    return "(?i)^" + "".join(parts) + "$"


def read_binary_files(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """S5: binary/PDF directory scan → (path, modificationTime, length,
    content). Reference: ``extract_pdf_text.py:147,185``. The reference's
    case-insensitive ``*.pdf``+``*.PDF`` double-glob generalizes to any
    plain glob (``*``, ``?``, literals — e.g. ``report_*.pdf``), matched
    case-insensitively.

    Two layers, same predicate: a case-insensitivized ``pathGlobFilter``
    prunes at FILE LISTING time — binaryFile scans materialize content,
    so skipping a non-matching file at listing saves reading its bytes
    entirely — and an anchored filename regex re-checks post-scan (the
    guarantee, and the part Catalyst can reason about)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", _ci_glob(glob))
        .load(path)
    )
    filename = F.element_at(F.split(F.col("path"), "/"), -1)
    return df.filter(filename.rlike(_glob_regex(glob)))


def from_api_rows(
    spark: SparkSession, rows: list[dict], schema: T.StructType
) -> DataFrame:
    """S6/S7: REST JSON source materialized driver-side. The reference
    fetches nested JSON (``pull_agency_info_api.py:10-41``) and unnests
    ``returnValue.objectData.responseResult[]``; here the fetch client is
    injectable and the unnested rows become a typed DataFrame."""
    return spark.createDataFrame(rows, schema)


def unnest_response(df: DataFrame, array_col: str) -> DataFrame:
    """Unnest an API payload column ``returnValue.*.responseResult[]``
    into one row per element (reference ``run_full_pipeline.py:348-352``)."""
    return df.select(F.explode(F.col(array_col)).alias("r")).select("r.*")


# ---------------------------------------------------------------------------
# Sinks
# ---------------------------------------------------------------------------


def write_csv_single(
    df: DataFrame,
    path: str,
    order_by: list[str] | None = None,
    quote_all: bool = False,
) -> None:
    """K1: deterministic single-file CSV with stable sort. Reference:
    ``run_full_pipeline.py:150-171,406-409``. ``coalesce(1)`` only at the
    write so the upstream plan keeps full parallelism; at 100 TB you would
    drop the coalesce and accept a sharded sink."""
    out = df.orderBy(*order_by) if order_by else df
    writer = out.coalesce(1).write.mode("overwrite").option("header", True)
    if quote_all:
        writer = writer.option("quoteAll", True)
    writer.csv(path)


def append_csv(df: DataFrame, path: str) -> None:
    """K2: CSV append sink (reference ``update_sir_summaries.py:399-413``)."""
    df.write.mode("append").option("header", True).csv(path)


def append_parquet_batch(df: DataFrame, path: str) -> None:
    """K3: append-only parquet batch sink, zstd (reference
    ``extract_pdf_text.py:174-176,235-241``). The timestamped-filename
    convention is subsumed by Spark's unique part-file names; the logical
    table is the directory union, exactly as in the reference."""
    df.write.mode("append").option("compression", "zstd").parquet(path)


def write_json(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """K4/K6: JSON sink, optionally partitioned."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def write_json_per_key(df: DataFrame, path: str, key: str) -> None:
    """K5: per-key JSON store (reference one ``{sha256}.json`` per row,
    ``export_parquet_to_json.py:269-276``). Expressed as a key-partitioned
    JSON sink — random access by key becomes partition pruning instead of
    a filesystem lookup, which is the scalable equivalent."""
    df.write.mode("overwrite").partitionBy(key).json(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a directory of parquet (e.g. a
    streaming sink's per-batch files) into ~``target_file_bytes`` files.
    Returns the output file count. File count is computed from the
    INPUT's on-disk bytes (no extra pass over the data) and the rewrite
    is a coalesce — a narrow, shuffle-free repack. At 100 TB this is the
    maintenance job that keeps scan task counts sane after streaming
    appends; run it per partition directory so each compaction is
    bounded."""
    import glob as _glob
    import os as _os

    total = sum(
        _os.path.getsize(f)
        for f in _glob.glob(f"{path}/**/*.parquet", recursive=True)
    )
    n_files = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(path)
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 8,
) -> None:
    """K3 at scale: range-clustered parquet layout for data skipping.
    ``repartitionByRange`` + ``sortWithinPartitions`` gives each output
    file a DISJOINT min/max range on the cluster columns, so a reader's
    range predicate prunes whole files from the parquet footer stats
    (row-group min/max) before any IO — the poor man's Z-order, and the
    single highest-leverage layout decision for a 100 TB time- or
    key-range-queried table. One range-exchange shuffle at write time
    buys every future scan its pruning."""
    cols = [F.col(c) for c in cluster_cols]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_with_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    ndv: int | None = None,
) -> None:
    """K3/S4 at scale: parquet write with BLOOM FILTERS on the lookup
    columns. Point lookups (sha256, ContentDocumentId — the reference's
    access pattern everywhere) then skip row groups whose bloom filter
    proves the key absent, without decoding a single page: min/max
    stats are useless for high-cardinality random keys (every file
    spans the whole key space), blooms are built for exactly that.
    ``ndv`` tunes the filter's expected distinct count per row group
    when known."""
    w = df.write.mode("overwrite")
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
        if ndv is not None:
            w = w.option(f"parquet.bloom.filter.expected.ndv#{c}", str(ndv))
    w.parquet(path)


def zorder_value(
    c1: "F.Column",
    c2: "F.Column",
    min1: float,
    max1: float,
    min2: float,
    max2: float,
    bits: int = 8,
) -> "F.Column":
    """Z-order (Morton) key: normalize both columns to ``bits``-bit
    integers against their [min, max] and interleave the bits. Rows
    close in Z are close in BOTH dimensions, so range-clustering on Z
    gives every file a small bounding box in (c1, c2) — min/max pruning
    then works for predicates on EITHER column, which single-column
    range clustering cannot do. 2×``bits`` shift/or terms: flat codegen."""
    top = (1 << bits) - 1
    n1 = F.least(
        F.lit(top),
        F.floor((c1 - F.lit(min1)) / F.lit(max(max1 - min1, 1e-12)) * top),
    ).cast("long")
    n2 = F.least(
        F.lit(top),
        F.floor((c2 - F.lit(min2)) / F.lit(max(max2 - min2, 1e-12)) * top),
    ).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        bit1 = F.shiftright(n1, i).bitwiseAND(F.lit(1))
        bit2 = F.shiftright(n2, i).bitwiseAND(F.lit(1))
        z = z + F.shiftleft(bit1, 2 * i + 1) + F.shiftleft(bit2, 2 * i)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    n_files: int = 8,
    bits: int = 8,
) -> None:
    """Two-dimensional data-skipping layout: range-cluster files along
    the Z-order curve of (c1, c2). One extra scan computes the global
    min/max (a 1-row result), one range exchange writes; after that,
    every file carries a tight min/max box on BOTH columns, so scans
    filtered on either prune files from footer stats alone — the
    same contract Delta's OPTIMIZE ZORDER BY provides."""
    lo1, hi1, lo2, hi2 = df.agg(
        F.min(c1), F.max(c1), F.min(c2), F.max(c2)
    ).first()
    if lo1 is None or lo2 is None:
        # empty (or all-null cluster-column) input: write it as-is —
        # an empty dataset, like write_range_clustered, not a TypeError
        df.write.mode("overwrite").parquet(path)
        return
    z = zorder_value(
        F.col(c1).cast("double"),
        F.col(c2).cast("double"),
        float(lo1),
        float(hi1),
        float(lo2),
        float(hi2),
        bits,
    )
    (
        df.repartitionByRange(n_files, z)
        .sortWithinPartitions(z)
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# WARC (Web ARChive, ISO 28500) record parsing — the container Common
# Crawl ships; stdlib-only, same real-kernel pattern as the WAV/PNG/PDF
# decoders in operators/.
# ---------------------------------------------------------------------------


def synth_warc(records: list[tuple[str, str, bytes]]) -> bytes:
    """Build a valid WARC file from (warc_type, target_uri, payload)
    records — version line, mandatory headers, correct Content-Length,
    double-CRLF terminators."""
    out = bytearray()
    for i, (wtype, uri, payload) in enumerate(records):
        headers = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            f"\r\n"
        ).encode()
        out += headers + payload + b"\r\n\r\n"
    return bytes(out)


def parse_warc_records(
    df,
    content_col: str = "content",
    id_col: str = "media_id",
    with_payload: bool = False,
):
    """REAL WARC parser over a binary column: walks records by version
    line, reads headers until the blank line, slices the payload by
    Content-Length (never by scanning for separators — payloads may
    contain them). 1 file row in → N record rows out (the UDTF shape),
    Arrow-batched; malformed trailing bytes end the walk rather than
    failing the stage.
    
    At 100 TB: WARC files are the unit of parallelism (one file per
    task via binaryFile scan feeding this kernel); records never cross
    files, so no shuffle is needed until after extraction."""
    import pandas as pd

    from pyspark.sql import types as T

    from mcyj_datapipeline_spark.operators.partitioning import (
        spread_for_compute,
    )

    fields = [
        T.StructField("media_id", T.LongType()),
        T.StructField("record_no", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("payload_len", T.LongType()),
        T.StructField("payload_prefix", T.StringType()),
    ]
    if with_payload:
        # full payload for downstream extraction stages (E9); latin-1 is
        # the byte-transparent carrier — charset handling is its own op
        fields.append(T.StructField("payload", T.StringType()))
    schema = T.StructType(fields)

    def _records(buf: bytes):
        pos, n = 0, 0
        while True:
            start = buf.find(b"WARC/", pos)
            if start < 0:
                return
            hdr_end = buf.find(b"\r\n\r\n", start)
            if hdr_end < 0:
                return
            headers = {}
            for line in buf[start:hdr_end].decode(
                "latin-1"
            ).split("\r\n")[1:]:
                if ":" in line:
                    k, v = line.split(":", 1)
                    headers[k.strip().lower()] = v.strip()
            try:
                clen = int(headers.get("content-length", ""))
            except ValueError:
                return
            payload = buf[hdr_end + 4:hdr_end + 4 + clen]
            if len(payload) < clen:
                return  # truncated record: stop, don't guess
            rec = (
                n,
                headers.get("warc-type", ""),
                headers.get("warc-target-uri", ""),
                clen,
                payload[:32].decode("latin-1"),
            )
            if with_payload:
                rec += (payload.decode("latin-1"),)
            yield rec
            n += 1
            pos = hdr_end + 4 + clen

    def kernel(batches):
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                if content is None:
                    continue
                for rec in _records(bytes(content)):
                    rows.append((int(mid), *rec))
            cols = [
                "media_id", "record_no", "warc_type", "target_uri",
                "payload_len", "payload_prefix",
            ]
            if with_payload:
                cols.append("payload")
            yield pd.DataFrame(rows, columns=cols)

    src = spread_for_compute(df.select(id_col, content_col), id_col)
    return src.mapInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# Sitemap XML parsing (stdlib xml.etree) — the discovery side of the
# crawl chain (robots.txt points here; URLs found here feed the
# frontier scheduler).
# ---------------------------------------------------------------------------


def synth_sitemap(entries: list[tuple[str, str, str]]) -> str:
    """Valid sitemap XML (sitemaps.org schema) from (loc, lastmod,
    changefreq) entries."""
    urls = "".join(
        f"<url><loc>{loc}</loc><lastmod>{lastmod}</lastmod>"
        f"<changefreq>{freq}</changefreq></url>"
        for loc, lastmod, freq in entries
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"{urls}</urlset>"
    )


def parse_sitemaps(
    df,
    content_col: str = "content",
    id_col: str = "media_id",
):
    """REAL sitemap parser (stdlib ElementTree, namespace-aware): one
    sitemap document row in → one row per <url> entry out. Malformed
    XML yields zero rows for that document (poison policy: skip, never
    fail the stage); missing optional fields surface as nulls."""
    import pandas as pd

    from pyspark.sql import types as T

    from mcyj_datapipeline_spark.operators.partitioning import (
        spread_for_compute,
    )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("loc", T.StringType()),
            T.StructField("lastmod", T.StringType()),
            T.StructField("changefreq", T.StringType()),
        ]
    )
    NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"

    def kernel(batches):
        import xml.etree.ElementTree as ET

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                if content is None:
                    continue
                try:
                    root = ET.fromstring(str(content))
                except ET.ParseError:
                    continue
                for url in root.iter(f"{NS}url"):
                    get = lambda tag: (  # noqa: E731
                        url.findtext(f"{NS}{tag}") or None
                    )
                    loc = get("loc")
                    if loc is None:
                        continue
                    rows.append((int(mid), loc, get("lastmod"), get("changefreq")))
            yield pd.DataFrame(
                rows, columns=["media_id", "loc", "lastmod", "changefreq"]
            )

    src = spread_for_compute(df.select(id_col, content_col), id_col)
    return src.mapInPandas(kernel, schema=schema)



def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """K3 at scale, join edition: hash-BUCKETED table layout
    (``bucketBy`` + ``saveAsTable`` with an explicit external path).
    Two tables bucketed on their join key with the same bucket count
    join with ZERO Exchange — the co-location is baked into the file
    layout, so the repeated fact-to-fact join (orders-lineitem on
    orderkey, state-table merges on the state key) pays its shuffle
    ONCE at write time instead of on every query. With ``sort_col``
    the buckets are also sorted, upgrading the join to a sort-merge
    over pre-sorted runs (no per-query sort either).

    This is the DataFrame-API expression of the reference's implicit
    access pattern: every incremental stage re-joins the same tables
    on the same keys (run_full_pipeline.py:44-61) — a layout decision,
    not a query decision, at 100 TB."""
    w = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
