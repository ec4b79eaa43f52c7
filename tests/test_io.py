"""Sources & sinks (S1–S5, K1–K5): CSV round trips, binary scan,
parquet batch append, per-key JSON store."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mcyj_datapipeline_spark import io as MIO


def test_csv_single_file_deterministic(spark, tmp_path):
    df = spark.createDataFrame(
        [("b", "2"), ("a", "1"), ("c", "3")], ["agency_id", "doc"]
    )
    out = str(tmp_path / "out.csv")
    MIO.write_csv_single(df, out, order_by=["agency_id"])
    import glob

    parts = glob.glob(f"{out}/part-*.csv")
    assert len(parts) == 1  # K1: single deterministic file
    lines = open(parts[0]).read().strip().splitlines()
    assert lines[0] == "agency_id,doc"
    assert [l.split(",")[0] for l in lines[1:]] == ["a", "b", "c"]

    back = MIO.read_csv(spark, out)
    assert back.count() == 3 and back.columns == ["agency_id", "doc"]


def test_csv_typed_schema_read(spark, tmp_path):
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("n", T.LongType())]
    )
    p = str(tmp_path / "typed.csv")
    spark.createDataFrame([("a", 1)], schema).write.option("header", True).csv(p)
    back = MIO.read_csv(spark, p, schema=schema)
    assert dict(back.dtypes) == {"k": "string", "n": "bigint"}


def test_binary_scan_case_insensitive_pdf(spark, tmp_path):
    (tmp_path / "a.pdf").write_bytes(b"%PDF-1")
    (tmp_path / "b.PDF").write_bytes(b"%PDF-2")
    (tmp_path / "c.txt").write_bytes(b"nope")
    df = MIO.read_binary_files(spark, str(tmp_path))
    assert df.count() == 2  # S5: *.pdf + *.PDF, not .txt
    assert set(df.columns) >= {"path", "content", "length"}


def test_parquet_batch_append_union(spark, tmp_path):
    p = str(tmp_path / "batches")
    d1 = spark.createDataFrame([("s1", ["p1"])], ["sha256", "text"])
    d2 = spark.createDataFrame([("s2", ["p2"])], ["sha256", "text"])
    MIO.append_parquet_batch(d1, p)
    MIO.append_parquet_batch(d2, p)
    # K3/S3: logical table = directory union of batch files.
    assert spark.read.parquet(p).count() == 2


def test_per_key_json_store_partition_pruned(spark, tmp_path):
    p = str(tmp_path / "docstore")
    df = spark.createDataFrame(
        [("sha1", "doc one"), ("sha2", "doc two")], ["sha256", "body"]
    )
    MIO.write_json_per_key(df, p, "sha256")
    back = spark.read.json(p)
    one = back.filter(F.col("sha256") == "sha1")
    assert one.count() == 1 and one.first()["body"] == "doc one"
    # X3: the key lookup prunes to one partition directory.
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_api_rows_and_unnest(spark):
    schema = T.StructType(
        [
            T.StructField(
                "returnValue",
                T.StructType(
                    [
                        T.StructField(
                            "responseResult",
                            T.ArrayType(
                                T.StructType(
                                    [T.StructField("agencyId", T.StringType())]
                                )
                            ),
                        )
                    ]
                ),
            )
        ]
    )
    payload = [{"returnValue": {"responseResult": [{"agencyId": "a1"}, {"agencyId": "a2"}]}}]
    df = MIO.from_api_rows(spark, payload, schema)
    out = MIO.unnest_response(df, "returnValue.responseResult")
    assert [r["agencyId"] for r in out.collect()] == ["a1", "a2"]


def test_csv_append_sink(spark, tmp_path):
    p = str(tmp_path / "results")
    d1 = spark.createDataFrame([("s1", "ok")], ["sha256", "status"])
    d2 = spark.createDataFrame([("s2", "ok")], ["sha256", "status"])
    MIO.append_csv(d1, p)
    MIO.append_csv(d2, p)
    # K2: appended batches accumulate in one logical CSV table.
    assert MIO.read_csv(spark, p).count() == 2


def test_nested_json_aggregate_sink(spark, tmp_path):
    p = str(tmp_path / "agencies")
    flat = spark.createDataFrame(
        [("a1", "d1", "2024-01-02"), ("a1", "d2", "2024-01-01"), ("a2", "d3", "2024-02-01")],
        ["agency_id", "doc", "date_iso"],
    )
    nested = flat.groupBy("agency_id").agg(
        F.reverse(
            F.sort_array(F.collect_list(F.struct("date_iso", "doc")))
        ).alias("documents"),
        F.count(F.lit(1)).alias("total_reports"),
    )
    MIO.write_json(nested, p)
    back = spark.read.json(p)
    # K4: nested per-agency aggregate round-trips; docs newest-first.
    row = back.filter(F.col("agency_id") == "a1").first()
    assert row["total_reports"] == 2
    assert [d["doc"] for d in row["documents"]] == ["d1", "d2"]


def test_raw_json_dump_sink(spark, tmp_path):
    p = str(tmp_path / "payload")
    df = spark.createDataFrame([('{"k": 1}',)], ["raw"])
    MIO.write_json(df, p)
    # K6: raw payload dump readable back.
    assert spark.read.json(p).count() == 1


def test_approx_count_distinct_accuracy(spark, sf_dir):
    """HLL++ sketch lands within its configured error of the exact
    distinct count (A4 scale form)."""
    from mcyj_datapipeline_spark.io import read_table

    ev = read_table(spark, sf_dir, "events")
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("user_id", 0.02)).first()[0]
    assert abs(approx - exact) / exact <= 0.05


def test_csv_permissive_corrupt_record_capture(spark, tmp_path):
    """Defensive ingestion (SURVEY §1.3): malformed CSV rows land in the
    corrupt-record column instead of failing the read; clean rows parse."""
    p = tmp_path / "dirty.csv"
    p.write_text("k,n\na,1\nbad-row-only-one-col\nb,2\n")
    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
    ).cache()
    assert df.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    assert df.filter(F.col("_corrupt_record").isNull()).count() == 2
    df.unpersist()


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    """Many small files -> few target-size files, content-identical."""
    from mcyj_datapipeline_spark.io import compact_parquet

    src = str(tmp_path / "small_files")
    dst = str(tmp_path / "compacted")
    # 8 separate appends -> at least 8 data files
    for i in range(8):
        spark.range(i * 10, (i + 1) * 10).write.mode("append").parquet(src)
    import glob

    n_before = len(glob.glob(f"{src}/*.parquet"))
    assert n_before >= 8
    n_planned = compact_parquet(spark, src, dst, target_file_bytes=10**9)
    n_after = len(glob.glob(f"{dst}/*.parquet"))
    assert n_planned == 1 and n_after == 1
    a = {r.id for r in spark.read.parquet(src).collect()}
    b = {r.id for r in spark.read.parquet(dst).collect()}
    assert a == b == set(range(80))


def test_binary_scan_arbitrary_glob(spark, tmp_path):
    """A glob with a literal prefix ('report_*.pdf') must match only
    that prefix — case-insensitively on both prefix and extension —
    and the listing-time pathGlobFilter must agree with the post-scan
    regex (a file excluded by one must be excluded by the other)."""
    (tmp_path / "report_1.pdf").write_bytes(b"%PDF-1")
    (tmp_path / "REPORT_2.PDF").write_bytes(b"%PDF-2")
    (tmp_path / "summary_3.pdf").write_bytes(b"%PDF-3")
    (tmp_path / "myreport_4.pdf").write_bytes(b"%PDF-4")  # prefix anchored
    (tmp_path / "report_5.txt").write_bytes(b"nope")
    got = {
        r["path"].rsplit("/", 1)[-1]
        for r in MIO.read_binary_files(
            spark, str(tmp_path), glob="report_*.pdf"
        ).collect()
    }
    assert got == {"report_1.pdf", "REPORT_2.PDF"}


def test_binary_scan_question_mark_glob(spark, tmp_path):
    (tmp_path / "v1.bin").write_bytes(b"a")
    (tmp_path / "v22.bin").write_bytes(b"b")
    got = {
        r["path"].rsplit("/", 1)[-1]
        for r in MIO.read_binary_files(spark, str(tmp_path), glob="v?.bin").collect()
    }
    assert got == {"v1.bin"}


def test_range_clustered_files_disjoint(spark, sf_dir):
    """write_range_clustered must give each parquet file a disjoint
    min/max range on the cluster column — THAT is what lets a range
    predicate prune whole files from footer stats before any IO."""
    import glob as globmod
    import tempfile

    import pyarrow.parquet as pq

    li = MIO.read_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_quantity"
    )
    out = tempfile.mkdtemp(prefix="rangecluster_test_")
    MIO.write_range_clustered(li, out, ["l_shipdate"], n_files=4)
    ranges = []
    for f in globmod.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # l_shipdate
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 3  # range partitioner used the file budget
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint (boundary touch allowed)


def test_write_with_bloom_embeds_filters(spark, sf_dir):
    """Bloom-filtered write: the parquet footers must actually carry a
    bloom filter for the lookup column (that is what lets a point
    lookup skip row groups a min/max range can never exclude for
    random keys), and read-back must round-trip."""
    import glob as globmod
    import tempfile

    import pyarrow.parquet as pq

    import os

    docs = MIO.read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    keyed = docs.withColumn(
        "key", F.sha2(F.col("doc_id").cast("string"), 256)
    ).coalesce(1)
    with_bloom = tempfile.mkdtemp(prefix="bloom_on_")
    without = tempfile.mkdtemp(prefix="bloom_off_")
    MIO.write_with_bloom(keyed, with_bloom, ["key"], ndv=1000)
    keyed.write.mode("overwrite").parquet(without)

    def total_bytes(d):
        return sum(
            os.path.getsize(f) for f in globmod.glob(f"{d}/*.parquet")
        )

    def rows(d):
        return sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in globmod.glob(f"{d}/*.parquet")
        )

    # Same rows either way; the bloom build must have added filter
    # bytes to the file (this pyarrow can't expose the bloom offset
    # directly, so the byte delta is the observable).
    assert rows(with_bloom) == rows(without) == docs.count()
    assert total_bytes(with_bloom) > total_bytes(without)
    assert spark.read.parquet(with_bloom).count() == docs.count()


def test_zorder_write_bounds_both_dimensions(spark, sf_dir):
    """Z-order layout: every file's min/max box must be materially
    tighter than the global range on BOTH columns — that is what lets a
    predicate on either column prune files. (Single-column range
    clustering gives this on one dimension only.)"""
    import glob as globmod
    import tempfile

    import pyarrow.parquet as pq

    li = MIO.read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    out = tempfile.mkdtemp(prefix="zorder_test_")
    MIO.write_zordered(li, out, "l_orderkey", "l_partkey", n_files=8)

    glob_lo = {c: None for c in ("l_orderkey", "l_partkey")}
    spans = {"l_orderkey": [], "l_partkey": []}
    files = globmod.glob(f"{out}/*.parquet")
    assert len(files) >= 4
    bounds = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        per_col = {}
        for ci, name in enumerate(md.schema.names):
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                mins.append(st.min)
                maxs.append(st.max)
            per_col[name] = (min(mins), max(maxs))
        bounds.append(per_col)
    for col in ("l_orderkey", "l_partkey"):
        g_lo = min(b[col][0] for b in bounds)
        g_hi = max(b[col][1] for b in bounds)
        avg_span = sum(b[col][1] - b[col][0] for b in bounds) / len(bounds)
        # Random placement would give every file ~the full range.
        assert avg_span < 0.8 * (g_hi - g_lo), col


def test_warc_payload_may_contain_separators(spark):
    """Payloads are sliced by Content-Length, so a payload containing
    the record separator (or a fake version line) must not split the
    record or spawn phantom records."""
    from mcyj_datapipeline_spark.io import parse_warc_records, synth_warc

    evil = b"x\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nyy"
    buf = synth_warc(
        [("response", "http://a.io/1", evil), ("request", "http://a.io/1", b"GET")]
    )
    df = spark.createDataFrame([(7, bytearray(buf))], "media_id long, content binary")
    rows = parse_warc_records(df).collect()
    assert [r["warc_type"] for r in rows] == ["response", "request"]
    assert rows[0]["payload_len"] == len(evil)


def test_warc_truncated_trailer_stops_cleanly(spark):
    from mcyj_datapipeline_spark.io import parse_warc_records, synth_warc

    buf = synth_warc([("response", "http://a.io/1", b"FULL RECORD")])
    cut = buf + synth_warc([("response", "http://a.io/2", b"LOST" * 10)])[:-25]
    df = spark.createDataFrame([(1, bytearray(cut))], "media_id long, content binary")
    rows = parse_warc_records(df).collect()
    assert len(rows) == 1  # the truncated second record is dropped, no crash
    assert rows[0]["target_uri"] == "http://a.io/1"


def test_sitemap_parse_missing_fields_and_poison(spark):
    from mcyj_datapipeline_spark.io import parse_sitemaps

    ok = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>http://a.io/1</loc></url>"   # no lastmod/changefreq
        "<url><lastmod>2026-01-01</lastmod></url>"  # no loc: dropped
        "</urlset>"
    )
    df = spark.createDataFrame(
        [(1, ok), (2, "<urlset><url><loc>busted")],
        "media_id long, content string",
    )
    rows = parse_sitemaps(df).collect()
    assert len(rows) == 1
    assert rows[0]["loc"] == "http://a.io/1"
    assert rows[0]["lastmod"] is None and rows[0]["changefreq"] is None


def test_compaction_reduces_files_preserves_data(spark, sf_dir, tmp_path):
    """Many tiny files in -> few right-sized files out, data identical
    (same rows, any order)."""
    from mcyj_datapipeline_spark.io import compact_parquet, read_table

    src = str(tmp_path / "small_files")
    dst = str(tmp_path / "compacted")
    orders = read_table(spark, sf_dir, "orders")
    orders.repartition(64).write.parquet(src)  # simulate incremental debris

    import os
    n_small = len([p for p in os.listdir(src) if p.endswith(".parquet")])
    assert n_small == 64

    n_out = compact_parquet(spark, src, dst)
    assert n_out == 1  # tiny table: everything fits one target file

    a = sorted(r["o_orderkey"] for r in spark.read.parquet(src).collect())
    b = sorted(r["o_orderkey"] for r in spark.read.parquet(dst).collect())
    assert a == b


def test_zorder_files_have_tight_boxes(spark, sf_dir):
    """write_zordered must give every file a bounding box that is
    small in BOTH dimensions — the property single-column range
    clustering cannot provide. Quantified: the mean per-file box area
    (fraction of the global 2-D range, width x height) must shrink by
    >= 4x vs an unclustered write of the same data."""
    import glob as globmod
    import tempfile

    import pyarrow.parquet as pq

    orders = MIO.read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )

    def mean_box_area(path):
        lo1, hi1, lo2, hi2 = orders.agg(
            F.min("o_custkey"), F.max("o_custkey"),
            F.min("o_totalprice"), F.max("o_totalprice"),
        ).first()
        areas = []
        for f in globmod.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            m1, x1, m2, x2 = [], [], [], []
            for rg in range(md.num_row_groups):
                c0 = md.row_group(rg).column(0).statistics
                c1 = md.row_group(rg).column(1).statistics
                m1.append(c0.min); x1.append(c0.max)
                m2.append(c1.min); x2.append(c1.max)
            w = (max(x1) - min(m1)) / max(hi1 - lo1, 1)
            h = (max(x2) - min(m2)) / max(hi2 - lo2, 1e-9)
            areas.append(w * h)
        return sum(areas) / len(areas)

    zdir = tempfile.mkdtemp(prefix="zorder_test_")
    MIO.write_zordered(orders, zdir, "o_custkey", "o_totalprice", n_files=8)
    plaindir = tempfile.mkdtemp(prefix="plain_test_")
    orders.repartition(8).write.mode("overwrite").parquet(plaindir)
    tight, loose = mean_box_area(zdir), mean_box_area(plaindir)
    assert tight < loose / 4, (tight, loose)


def test_o3_src_file_basename_attribution(spark, sf_dir):
    """O3's per-row source-file attribution (kept OUT of the value
    oracle so the oracle can't fail for storage-layout reasons): every
    row's src_file basename must name the parquet file it came from —
    here the single-file-per-table test layout."""
    from pyspark.sql import functions as F

    from mcyj_datapipeline_spark.io import read_table

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "src_file", F.regexp_extract(F.input_file_name(), "[^/]+$", 0)
    )
    names = [r[0] for r in docs.select("src_file").distinct().collect()]
    assert names == ["documents.parquet"]
