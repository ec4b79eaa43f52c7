"""Property-style model checks: randomized inputs (seeded), one Spark
job per property, row-by-row comparison against a pure-Python model of
the reference semantics. Covers the operators whose correctness hinges
on ordering/dedup subtleties rather than arithmetic (F12 keyword
reduction, F8 multi-format dates, union-dedup precedence)."""

from __future__ import annotations

import datetime
import random

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.functions.dates import parse_date_multi
from mcyj_datapipeline_spark.operators.aggregates import reduce_keywords
from mcyj_datapipeline_spark.operators.relational import (
    union_dedup_first_wins,
)

MAPPING = {
    "the": "",
    "a": "",
    "neglect": "child neglect",
    "abuse": "child abuse",
    "ratio": "staffing ratio",
    "med": "medication",
}
VOCAB = list(MAPPING) + ["supervision", "training", "license", "safety", "food"]


def model_reduce(kws: list[str]) -> list[str]:
    """Reference keyword_reduction.py:58-77 — map, drop '', dedup
    preserving first-occurrence order (seen-set loop)."""
    out, seen = [], set()
    for kw in kws:
        red = MAPPING.get(kw, kw)
        if red == "" or red in seen:
            continue
        seen.add(red)
        out.append(red)
    return out


def test_keyword_reduction_matches_model(spark):
    rng = random.Random(7)
    rows = [
        (i, [rng.choice(VOCAB) for _ in range(rng.randrange(0, 12))])
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "keywords"])
    mapping = spark.createDataFrame(
        list(MAPPING.items()), ["original_keyword", "reduced_keyword"]
    )
    got = {
        r["doc_id"]: r["keywords"]
        for r in reduce_keywords(docs, mapping, "keywords", ["doc_id"]).collect()
    }
    for doc_id, kws in rows:
        assert got[doc_id] == model_reduce(kws), (doc_id, kws)


def test_multiformat_date_parse_matches_model(spark):
    rng = random.Random(11)
    fmts = [
        ("%m/%d/%Y", "MM/dd/yyyy"),
        ("%B %d, %Y", "MMMM d, yyyy"),
        ("%Y-%m-%d", "yyyy-MM-dd"),
    ]
    rows = []
    for i in range(200):
        d = datetime.date(2000 + rng.randrange(25), 1 + rng.randrange(12), 1 + rng.randrange(28))
        pyfmt, _ = fmts[i % 3]
        rows.append((i, d.strftime(pyfmt), d))
    # plus unparseable garbage
    rows += [(900, "not a date", None), (901, "13/45/2024", None)]
    df = spark.createDataFrame(
        [(i, raw) for i, raw, _ in rows], ["i", "raw"]
    )
    out = {
        r["i"]: r["parsed"]
        for r in df.select(
            "i",
            parse_date_multi(
                F.col("raw"), [sf for _, sf in fmts]
            ).alias("parsed"),
        ).collect()
    }
    for i, _, expected in rows:
        assert out[i] == expected, (i, out[i], expected)


def test_union_dedup_precedence_matches_model(spark):
    rng = random.Random(13)
    preferred = [(k, f"p{k}") for k in rng.sample(range(100), 40)]
    legacy = [(k, f"l{k}") for k in rng.sample(range(100), 70)]
    model = {k: v for k, v in reversed(legacy)}
    model.update({k: v for k, v in reversed(preferred)})  # preferred wins
    a = spark.createDataFrame(preferred, ["k", "v"])
    b = spark.createDataFrame(legacy, ["k", "v"])
    got = {r["k"]: r["v"] for r in union_dedup_first_wins(a, b, "k").collect()}
    assert got == model


def test_grouped_zscore_degenerate_groups(spark):
    """Single-row / constant-value groups have std 0 — z-score must be
    0.0, not NaN/inf."""
    from mcyj_datapipeline_spark.operators.text_analysis import grouped_zscore

    df = spark.createDataFrame(
        [("solo", 5), ("flat", 3), ("flat", 3), ("mix", 1), ("mix", 3)],
        ["g", "v"],
    )
    out = {(r["g"], r["v"]): r["zscore"] for r in grouped_zscore(df, "g", "v").collect()}
    assert out[("solo", 5)] == 0.0
    assert out[("flat", 3)] == 0.0
    assert out[("mix", 1)] == -1.0 and out[("mix", 3)] == 1.0


def test_chunking_partitions_tokens_exactly(spark):
    """Model check: with stride == chunk_size the chunks PARTITION the
    token stream — reassembling them in chunk_idx order reproduces the
    original text exactly, for random lengths including the
    shorter-than-one-chunk edge."""
    from mcyj_datapipeline_spark.operators.text_analysis import (
        chunk_documents,
    )

    rng = random.Random(11)
    rows = [
        (i, " ".join(f"t{rng.randrange(50)}" for _ in range(rng.randrange(1, 90))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_documents(df, chunk_size=16, stride=16).collect()
    rebuilt: dict[int, list[tuple[int, str]]] = {}
    for r in out:
        rebuilt.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk"]))
    assert len(rebuilt) == len(rows)
    for doc_id, text in rows:
        parts = [c for _, c in sorted(rebuilt[doc_id])]
        assert " ".join(p for p in parts if p) == text


def test_quantization_error_bound_property(spark):
    """|x - dequant(quant(x))| <= max|x| / 254 for every element of
    random vectors (the symmetric-int8 guarantee the 4x compression
    rides on)."""
    from mcyj_datapipeline_spark.operators.similarity import (
        dequantize_int8,
        quantize_int8,
    )

    rng = random.Random(23)
    rows = [
        (i, [rng.uniform(-10, 10) for _ in range(16)]) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["i", "e"])
    got = df.select(
        "i", "e", dequantize_int8(quantize_int8(F.col("e"))).alias("d")
    ).collect()
    for r in got:
        bound = max(abs(x) for x in r["e"]) / 254 + 1e-9
        assert all(abs(a - b) <= bound for a, b in zip(r["e"], r["d"]))


def test_mixture_resample_shares_property(spark):
    """For random skewed corpora, the resampled output's stratum shares
    must land near the requested mixture, and no stratum may exceed its
    available rows (never upsample)."""
    from mcyj_datapipeline_spark.operators.sampling import mixture_resample

    rng = random.Random(31)
    sizes = {"a": 900, "b": 420, "c": 150}
    rows = [
        (f"{s}{i}", s) for s, n in sizes.items() for i in range(n)
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    targets = {"a": 0.5, "b": 0.3, "c": 0.2}
    out = mixture_resample(df, "lang", "doc_id", targets)
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(counts.values())
    # c is the binding stratum: 150/0.2 = 750 target output size.
    assert counts["c"] == 150
    for s, t in targets.items():
        assert counts[s] <= sizes[s]
        assert abs(counts[s] / total - t) < 0.05


def test_sequence_packing_partition_exactness(spark, sf_dir):
    """Packing is a partition of the token stream: per-doc piece sums
    re-add to the doc's token count; per-sequence sums never exceed
    seq_len; offsets tile each document without gaps."""
    from pyspark.sql import functions as F

    from mcyj_datapipeline_spark.io import read_table
    from mcyj_datapipeline_spark.operators import text_analysis as TA

    docs = read_table(spark, sf_dir, "documents")
    pieces = TA.pack_training_sequences(docs, seq_len=64)

    toks = docs.select(
        "doc_id", TA.token_count(F.col("text")).alias("n")
    ).filter(F.col("n") > 0)
    per_doc = pieces.groupBy("doc_id").agg(
        F.sum("piece_tokens").alias("s"), F.min("piece_offset").alias("o0")
    )
    bad = (
        toks.join(per_doc, "doc_id", "left")
        .filter(
            (F.col("s") != F.col("n")) | (F.col("o0") != 0) | F.col("s").isNull()
        )
        .count()
    )
    assert bad == 0

    over = (
        pieces.groupBy("stream", "seq_id")
        .agg(F.sum("piece_tokens").alias("s"))
        .filter(F.col("s") > 64)
        .count()
    )
    assert over == 0

    # every sequence except each stream's last is exactly full
    per_seq = pieces.groupBy("stream", "seq_id").agg(
        F.sum("piece_tokens").alias("s")
    )
    last = per_seq.groupBy("stream").agg(F.max("seq_id").alias("last_seq"))
    partial = (
        per_seq.join(last, "stream")
        .filter((F.col("seq_id") != F.col("last_seq")) & (F.col("s") != 64))
        .count()
    )
    assert partial == 0


def test_salvage_table_poison_heavy_equivalence_and_python_row_count(
    spark, monkeypatch
):
    """F16 under a poison-heavy corpus (>50% of rows fail the JVM fast
    path): salvage_llm_json_table must (a) produce exactly what the
    pure-Python fast->slow reference cascade produces for EVERY row, and
    (b) send exactly the fast-path-failed rows through the Python UDF —
    counted by an accumulator inside a monkeypatched UDF, so the
    assertion is on the BatchEvalPython stage's true input, not plan
    structure."""
    import json
    import re as _re

    import mcyj_datapipeline_spark.functions.textfn as tf
    from mcyj_datapipeline_spark.operators.procedural import salvage_json
    from pyspark.sql import types as T

    rng = random.Random(20260814)
    rows = []
    n_fast_fail_expected = 0
    kinds = [
        "clean",
        "clean_noisy",
        "two_objects",  # fast hit: Jackson stops at the first object
        "no_json",
        "no_json",
        "truncated",
        "truncated",
        "garbage_braces",  # corrupt slice -> must NOT count as fast hit
        "poison_then_good",  # corrupt prefix, salvage recovers trailing
        "poison_then_good",
    ]
    for i in range(300):
        kind = rng.choice(kinds)
        s = rng.choice(["ok", "bad {x}", 'quote " inside', "multi\nline"])
        v = rng.choice(["HIGH", "LOW", "none"])
        if kind == "clean":
            text = f'{{"summary": {json.dumps(s)}, "violation": "{v}"}}'
        elif kind == "clean_noisy":
            text = (
                f'LLM says: {{"summary": {json.dumps(s)}, '
                f'"violation": "{v}"}} -- end of answer'
            )
        elif kind == "two_objects":
            text = (
                f'a {{"summary": {json.dumps(s)}}} b '
                f'{{"violation": "{v}"}} c'
            )
        elif kind == "no_json":
            text = f"no braces at all {s} {v}"
        elif kind == "truncated":
            text = f'{{"summary": {json.dumps(s)}, "violation": "{v}"'
        elif kind == "garbage_braces":
            text = f"xx {{not json {v}}} yy"
        else:  # poison_then_good — the PERMISSIVE struct-of-nulls trap:
            # the greedy slice is corrupt, but the scanner finds the
            # trailing valid object; a bare from_json null-check would
            # wrongly fast-hit with (null, null) here
            text = (
                f'xx {{not json}} yy {{"summary": {json.dumps(s)}, '
                f'"violation": "{v}"}}'
            )
        rows.append((i, text))

    # pure-Python reference: the documented fast->slow cascade. The
    # fast model is raw_decode (parse the FIRST value, ignore trailing
    # junk) — mirroring Jackson's from_json behavior, which stops at
    # the first complete object.
    def ref(text):
        m = _re.search(r"\{.*\}", text, _re.DOTALL)
        if m:
            try:
                obj, _ = json.JSONDecoder().raw_decode(m.group(0))
                if isinstance(obj, dict):
                    return obj, True
            except ValueError:
                pass
        return salvage_json(text), False

    expected = {}
    for i, text in rows:
        obj, fast_hit = ref(text)
        if not fast_hit:
            n_fast_fail_expected += 1
        expected[i] = (
            (None, None)
            if obj is None
            else (obj.get("summary"), obj.get("violation"))
        )
    assert n_fast_fail_expected > len(rows) * 0.5, (
        "fixture must be poison-heavy: "
        f"{n_fast_fail_expected}/{len(rows)} fast-path failures"
    )

    acc = spark.sparkContext.accumulator(0)

    def counting_udf():
        from pyspark.sql.functions import udf

        @udf(returnType=T.StringType())
        def _salvage(text):
            acc.add(1)
            obj = salvage_json(text or "")
            return json.dumps(obj) if obj is not None else None

        return _salvage

    monkeypatch.setattr(tf, "_salvage_udf", counting_udf)

    df = spark.createDataFrame(rows, "row_id long, raw string")
    out = tf.salvage_llm_json_table(df, "raw", out="parsed").collect()

    assert len(out) == len(rows)
    got = {
        r["row_id"]: (
            (None, None)
            if r["parsed"] is None
            else (r["parsed"]["summary"], r["parsed"]["violation"])
        )
        for r in out
    }
    assert got == expected
    # the Python stage saw exactly the fast-path-failed slice
    assert acc.value == n_fast_fail_expected
