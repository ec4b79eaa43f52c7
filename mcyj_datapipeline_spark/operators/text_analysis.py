"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure column expressions (JVM codegen, no UDFs), so they run at
scan speed over 100 TB of documents and Catalyst prunes to exactly
the ``text`` column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists for the n-gram/stopword
# language-ID heuristic. Deterministic, SQL-replicable.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "des"],
}

STOPWORDS_EN = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
]

FINGERPRINT_PRIME = 1_000_000_007
FINGERPRINT_BASE = 31
FINGERPRINT_CHARS = 64


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the baseline tokenizer)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish regex tokenization: word pieces, numbers, punctuation
    runs — the common pre-tokenizer split (GPT-2 style, simplified)."""
    return F.filter(
        F.split(text, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
        lambda t: (t != "") & (t != " "),
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS_EN
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in sw])))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters or space."""
    stripped = F.regexp_replace(text, r"[^A-Za-z ]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite quality score in [0, 1]: blends token count sufficiency,
    mean word length plausibility, alpha ratio, and stopword presence —
    the standard cheap heuristics (C4/Gopher-style length & symbol
    filters) as one JVM expression."""
    n = token_count(text).cast("double")
    len_ok = F.least(n / F.lit(20.0), F.lit(1.0))
    mwl = mean_word_length(text)
    mwl_ok = F.when((mwl >= 3) & (mwl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        F.lit(0.25) * len_ok
        + F.lit(0.25) * mwl_ok
        + F.lit(0.25) * alpha_ratio(text)
        + F.lit(0.25) * F.least(stopword_ratio(text) * 4, F.lit(1.0)),
        6,
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit ratio."""
    toks = tokens(F.lower(text))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(
            F.filter(toks, lambda t: t.isin(*[F.lit(m) for m in markers]))
        )
        out[lang] = hits / F.greatest(F.size(toks), F.lit(1))
    return out


def lang_id(text: Column) -> Column:
    """Argmax language by marker ratio; 'und' when no marker hits.
    Ties break by language code order (deterministic)."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_max(pairs)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column, n_chars: int = FINGERPRINT_CHARS) -> Column:
    """Polynomial rolling-hash fingerprint of the first ``n_chars``
    characters: h = Σ h*B + code(c) mod P. Pure fold over the character
    array — deterministic, SQL-replicable."""
    chars = F.slice(F.split(F.substring(text, 1, n_chars), ""), 1, n_chars)
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FINGERPRINT_BASE + F.ascii(c)) % FINGERPRINT_PRIME,
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document text-analysis profile."""
    t = F.col(text_col)
    return df.select(
        *[c for c in df.columns if c != text_col],
        token_count(t).alias("n_tokens"),
        char_count(t).alias("n_chars_computed"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(mean_word_length(t), 6).alias("mean_word_len"),
        F.round(alpha_ratio(t), 6).alias("alpha_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )


def grouped_zscore(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "zscore",
) -> DataFrame:
    """Per-group z-score via ``applyInPandas`` (grouped-map): each group
    arrives as one pandas frame, normalized with vectorized numpy. The
    grouped-map shape matters when per-group logic is genuinely
    imperative; for plain z-scores a window expression would do — this
    exists to cover that API surface with a checkable kernel. Population
    std (ddof=0) to match SQL ``stddev_pop``. Groups bigger than memory
    need the window form instead — grouped-map materializes one group
    per task."""
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        df.select(group_col, value_col).schema.fields
        + [T.StructField(out_col, T.DoubleType())]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        std = v.std(ddof=0)
        z = (v - v.mean()) / std if std > 0 else v * 0.0
        return pdf.assign(**{out_col: z.round(6)})

    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(
        kernel, out_schema
    )


PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
PII_SSN = r"\b\d{3}-\d{2}-\d{4}\b"


def redact_pii(text: Column) -> Column:
    """Training-data hygiene: replace email / phone / SSN shapes with
    typed placeholder tokens. Pure regexp_replace chain (JVM-side,
    codegen); patterns stay in the RE2-compatible subset so the SQL
    oracle runs the identical expressions. SSN before phone: the phone
    pattern's 3-3-4 shape would otherwise half-match an SSN's tail."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_SSN, "<SSN>")
    out = F.regexp_replace(out, PII_PHONE, "<PHONE>")
    return out


def repetition_signals(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality signals: fraction of duplicate
    word tokens and the share of the most frequent token. High values
    flag boilerplate/spam for the cleaning pipeline. Computed with one
    explode + two-level aggregation — no UDFs, partial-agg friendly."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    per_tok = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_tok.groupBy(id_col)
        .agg(
            F.sum("c").alias("_n"),
            F.count(F.lit(1)).alias("_distinct"),
            F.max("c").alias("_top"),
        )
        .select(
            id_col,
            F.round(1 - F.col("_distinct") / F.col("_n"), 6).alias("dup_token_frac"),
            F.round(F.col("_top") / F.col("_n"), 6).alias("top_token_share"),
        )
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 16,
    stride: int = 8,
) -> DataFrame:
    """Training-sequence prep: split each document into fixed-size token
    windows with overlap (``stride`` < ``chunk_size`` overlaps; equal
    means disjoint) — the standard chunking pass before packing
    sequences for an LLM. Returns (id, chunk_idx, chunk, n_tokens).

    All JVM-side: tokenize once, ``sequence`` generates chunk indices,
    ``explode`` fans out, ``slice`` windows the SAME token array — the
    text is never re-tokenized per chunk and nothing leaves codegen.
    1→N fan-out on the narrow (id, tokens) projection only; at 100 TB
    the output is ~len/stride× the input rows but each carries only its
    window. The final partial window is kept (truncated, as training
    pipelines do before pad/pack)."""
    w = F.split(F.col(text_col), " ")
    n_last = F.greatest(
        F.lit(0),
        F.floor((F.size(w) - F.lit(chunk_size) + F.lit(stride - 1)) / stride),
    ).cast("int")
    chunks = df.select(
        F.col(id_col),
        w.alias("_w"),
        F.explode(F.sequence(F.lit(0), n_last)).alias("chunk_idx"),
    )
    window = F.slice(
        F.col("_w"), F.col("chunk_idx") * stride + 1, chunk_size
    )
    return chunks.select(
        id_col,
        "chunk_idx",
        F.concat_ws(" ", window).alias("chunk"),
        F.size(window).alias("n_tokens"),
    )


def char_entropy(text: Column) -> Column:
    """Per-document character-level Shannon entropy (bits/char) — the
    cheap perplexity proxy for quality filtering: binary junk and
    repeated-char spam score low, natural text lands ~4±1. Computed
    over the char histogram via aggregate on the distinct chars — pure
    expressions, no explode needed per doc."""
    chars = F.split(text, "")
    n = F.size(chars)
    distinct = F.array_distinct(chars)
    # -sum over distinct chars of p*log2(p), p = count(c)/n
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        -F.aggregate(
            distinct,
            F.lit(0.0),
            lambda acc, c: acc
            + (
                F.size(F.filter(chars, lambda x: x == c)) / n
            )
            * F.log2(F.size(F.filter(chars, lambda x: x == c)) / n),
        )
    )


def split_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
) -> DataFrame:
    """Explode a document into (id, pos, line) rows — the segmentation
    step before line-level dedup/boilerplate passes. ``pos`` preserves
    document order so the cleaned text can be reassembled."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delim)).alias("pos", "line"),
    )


def window_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_words: int = 3,
) -> DataFrame:
    """Synthesized 'lines' for single-line corpora: disjoint
    ``line_words``-token windows via :func:`chunk_documents` (real
    newline-delimited corpora use :func:`split_lines` instead). Same
    (id, pos, line) contract."""
    return chunk_documents(
        df, text_col, id_col, chunk_size=line_words, stride=line_words
    ).select(
        id_col,
        F.col("chunk_idx").alias("pos"),
        F.col("chunk").alias("line"),
    )


def remove_boilerplate_lines(
    lines: DataFrame,
    id_col: str = "doc_id",
    pos_col: str = "pos",
    line_col: str = "line",
    min_docs: int = 3,
    joiner: str = " ",
) -> DataFrame:
    """CCNet-style cross-document boilerplate removal: a line that
    appears in >= ``min_docs`` DISTINCT documents is navigation/footer
    boilerplate; drop every occurrence corpus-wide and reassemble each
    document from its surviving lines in original order.

    Returns (id, clean_text, n_kept, n_dropped); documents whose lines
    were ALL boilerplate survive with clean_text = ''.

    100 TB plan: one explode (done by the caller's segmentation), one
    groupBy on the line text (map-side partial count-distinct via the
    two-level (line, id) agg), and one left-anti hash join back — the
    shuffle carries (line, id) pairs, never document bodies, and the
    boilerplate side of the anti-join is the tiny high-frequency tail
    so AQE broadcasts it. Reassembly groups by id: collect_list of
    (pos, line) structs, array_sort, join — each group is one document,
    so state is bounded by document length, not corpus size."""
    per_doc_line = lines.groupBy(line_col, id_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    boiler = (
        per_doc_line.groupBy(line_col)
        .agg(F.count(F.lit(1)).alias("_ndocs"))
        .filter(F.col("_ndocs") >= min_docs)
        .select(line_col)
    )
    kept = lines.join(boiler, line_col, "left_anti")
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n_lines"))
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(pos_col), F.col(line_col)))
                ),
                lambda s: s[line_col],
            ),
            joiner,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        (F.col("_n_lines") - F.coalesce("n_kept", F.lit(0))).alias(
            "n_dropped"
        ),
    )


def _word_ngrams(text: Column, n: int) -> Column:
    """ALL word n-grams (non-distinct, order preserved) — unlike
    dedup.word_shingles, repeats are kept because repetition is the
    signal here. Short texts yield an empty array (same sequence(1,0)
    guard as word_shingles)."""
    words = F.split(text, " ")
    k = F.size(words) - (n - 1)
    return F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _top_gram_share(
    df: DataFrame, text_col: str, id_col: str, n: int, out: str
) -> DataFrame:
    grams = df.select(
        F.col(id_col), F.explode(_word_ngrams(F.col(text_col), n)).alias("_g")
    )
    per = grams.groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_c"))
    return per.groupBy(id_col).agg(
        F.round(F.max("_c") / F.sum("_c"), 6).alias(out)
    )


def line_repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_words: int = 3,
) -> DataFrame:
    """Gopher-style line/n-gram repetition filters (Rae et al. 2021,
    public): per document, the fraction of duplicate lines, the
    fraction of characters inside duplicated lines, and the share of
    the most frequent word 2-gram / 3-gram. High values flag
    boilerplate, spam and template pages for the cleaning pipeline.

    Everything is explode + two-level aggregation on (id, unit) — all
    partial-agg friendly, no UDFs, no windows; the join back together
    is id-keyed so the three signal branches co-partition after the
    first shuffle. Missing branches (documents too short for an
    n-gram) coalesce to 0.0."""
    lines = window_lines(df, text_col, id_col, line_words)
    per_line = (
        lines.withColumn("_len", F.length("line"))
        .groupBy(id_col, "line", "_len")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    line_sig = per_line.groupBy(id_col).agg(
        F.round(1 - F.count(F.lit(1)) / F.sum("_c"), 6).alias(
            "dup_line_frac"
        ),
        F.round(
            F.sum(F.when(F.col("_c") > 1, F.col("_c") * F.col("_len")).otherwise(F.lit(0)))
            / F.sum(F.col("_c") * F.col("_len")),
            6,
        ).alias("dup_line_char_frac"),
    )
    g2 = _top_gram_share(df, text_col, id_col, 2, "top_bigram_share")
    g3 = _top_gram_share(df, text_col, id_col, 3, "top_trigram_share")
    return (
        line_sig.join(g2, id_col, "left")
        .join(g3, id_col, "left")
        .select(
            id_col,
            "dup_line_frac",
            "dup_line_char_frac",
            F.coalesce("top_bigram_share", F.lit(0.0)).alias(
                "top_bigram_share"
            ),
            F.coalesce("top_trigram_share", F.lit(0.0)).alias(
                "top_trigram_share"
            ),
        )
    )


def pack_training_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    stream_col: str = "lang",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Concat-and-chop sequence packing: documents are laid end-to-end
    per stream (language) in deterministic ``id_col`` order and cut into
    fixed ``seq_len``-token training sequences; documents crossing a cut
    split into pieces. Returns one row per (sequence, document piece):
    ``(stream, seq_id, doc_id, piece_offset, piece_tokens)`` —
    ``piece_offset`` is the token offset inside the document, so a
    loader can reassemble sequences exactly.

    This is the training-loader packing step (padding-free batching, as
    described in public LM-training writeups) downstream of cleaning;
    :func:`chunk_documents` is the RAG-style overlapping chunker, and
    the e5 query packs whole docs to shard granularity — this one
    splits at exact token boundaries.

    Scale: the running sum partitions by ``stream_col`` (the natural
    training-mix key) — no global window. For a single-language corpus
    at 100 TB, sub-shard the stream key (e.g. ``(lang, hash_bucket)``)
    and accept one partial sequence of waste per sub-shard; the
    boundary-piece explode is a per-row ``sequence()`` of length
    1 + pieces, never a join.
    """
    from pyspark.sql import Window

    # ``n_tokens_col``: pre-counted tokens (r11) — lets a pipeline
    # that already made its one pass over the text (e8's quality +
    # sha + token-count projection) pack WITHOUT re-reading text.
    # Must equal token_count(text) for the closed-form oracle to hold.
    n_expr = (
        F.col(n_tokens_col)
        if n_tokens_col is not None
        else token_count(F.col(text_col))
    )
    toks = docs.select(
        F.col(stream_col).alias("stream"),
        F.col(id_col),
        n_expr.alias("n"),
    ).filter(F.col("n") > 0)
    w = (
        Window.partitionBy("stream")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        toks.withColumn("end", F.sum("n").over(w))
        .withColumn("start", (F.col("end") - F.col("n")).cast("long"))
        .withColumn("end", F.col("end").cast("long"))
    )
    pieces = spans.select(
        "stream",
        id_col,
        "start",
        "end",
        F.explode(
            F.sequence(
                F.floor(F.col("start") / seq_len).cast("long"),
                F.floor((F.col("end") - 1) / seq_len).cast("long"),
            )
        ).alias("seq_id"),
    )
    lo = F.greatest(F.col("start"), F.col("seq_id") * seq_len)
    hi = F.least(F.col("end"), (F.col("seq_id") + 1) * seq_len)
    return pieces.select(
        "stream",
        "seq_id",
        id_col,
        (lo - F.col("start")).alias("piece_offset"),
        (hi - lo).alias("piece_tokens"),
    )


def compression_ratio(df, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style compressibility quality signal: zlib(deflate,
    level 6) bytes over raw UTF-8 bytes per document. Repetitive spam
    compresses far below fluent text (~0.1 vs ~0.4-0.6); random bytes
    sit near 1.0 — low AND high extremes are junk flags.

    zlib is not expressible in SQL, so this is an Arrow-batched
    ``mapInPandas`` kernel (the same quarantined-Python tier as the PDF
    and fingerprint kernels): per-row work is one C-speed deflate, the
    Python stage emits (id, two doubles), and the text column never
    leaves the stage. Deterministic — fixed zlib level, no dictionary —
    so results are stable across partitionings (tested).
    """
    import zlib

    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            n_raw = raw.str.len()
            n_zip = raw.map(lambda b: len(zlib.compress(b, 6)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n_raw,
                    "ratio": (n_zip / n_raw.where(n_raw > 0)).astype(
                        float
                    ),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        kernel, f"{id_col} long, n_bytes long, ratio double"
    )


def _bpe_train(df, text_col: str, k: int):
    """Shared BPE training loop: ``k`` rounds of "count adjacent symbol
    pairs weighted by word frequency, merge the argmax everywhere".
    Returns ``(merges, final_words, persisted_words)`` — the learned
    merge list, the word table AFTER all rewrites (its ``sym`` column
    IS the BPE segmentation of every word type), and the persisted
    source table the caller must unpersist."""
    from pyspark.sql import functions as F

    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "sym", F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 "))
        )
        .persist()
    )
    out = []
    cur = words
    for it in range(1, k + 1):
        s = F.split(F.col("sym"), " ")
        pairs = F.when(
            F.size(s) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(s) - 1),
                lambda j: F.concat_ws(
                    " ", F.element_at(s, j), F.element_at(s, j + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        top = (
            cur.select(F.explode(pairs).alias("pair"), "cnt")
            .groupBy("pair")
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.desc("total"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, total = top[0]["pair"], top[0]["total"]
        merged = pair.replace(" ", "")
        out.append((it, pair, merged, int(total)))
        cur = cur.withColumn(
            "sym",
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("sym"), F.lit(" ")),
                    F.lit(f" {pair} "),
                    F.lit(f" {merged} "),
                )
            ),
        )
    return out, cur, words


def bpe_top_merges(
    df,
    text_col: str = "text",
    k: int = 3,
):
    """The core of BPE tokenizer TRAINING: ``k`` rounds of "count all
    adjacent symbol pairs (weighted by word frequency), merge the most
    frequent pair everywhere" (Sennrich et al. 2016). Returns one row
    per learned merge: (iteration, pair, merged, pair_count).

    Distribution shape: the corpus collapses to a distinct-word
    frequency table first (vocabulary-sized, the standard trick — at
    100 TB the word table is millions of rows, not trillions), then
    each round is ONE pair-count groupBy over the word table plus a
    driver collect of exactly one row (the argmax pair — bounded like
    the k-means centroid collect) and a literal symbol rewrite.

    Semantics note (identical in Spark and DuckDB, deviating from
    canonical greedy BPE only on runs of a repeated symbol): the merge
    applies via space-padded literal replace, so in ``a a a a`` the
    second ``a a`` occurrence shares its boundary space with the first
    and survives until the NEXT round. Pair counting itself is the
    canonical overlapping zip-adjacent count."""
    spark = df.sparkSession
    out, _cur, words = _bpe_train(df, text_col, k)
    words.unpersist()
    return spark.createDataFrame(
        out, "iteration int, pair string, merged string, pair_count bigint"
    )


def bpe_encode_vocab(
    df,
    text_col: str = "text",
    k: int = 3,
):
    """BPE tokenizer APPLICATION: train ``k`` merges (same loop as
    :func:`bpe_top_merges`), then emit the resulting segmentation of
    every word TYPE — (w, cnt, pieces, n_pieces). This is the encode
    half of the tokenizer story: at serving time the corpus encodes by
    joining its (vocabulary-sized) word table against exactly this
    relation, so per-word work happens once per type, never per token
    occurrence.

    The final word table after the k-th rewrite already IS the encoded
    vocabulary (training's rewrite and encoding's merge application are
    the same operation in rank order), so encode costs nothing beyond
    the training rounds plus one projection."""
    from pyspark.sql import functions as F

    _out, cur, words = _bpe_train(df, text_col, k)
    enc = cur.select(
        "w",
        "cnt",
        F.col("sym").alias("pieces"),
        F.size(F.split(F.col("sym"), " ")).alias("n_pieces"),
    ).localCheckpoint(eager=True)
    words.unpersist()
    return enc


def phrase_match_counts(
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact token-phrase search via a positional index: documents whose
    whitespace token stream contains ``phrase`` as a consecutive run,
    with per-document match count and first match position (0-based).

    Scale shape: this is the plan you get when the corpus has a
    materialized positional inverted index (term, doc, pos) — the
    FIRST thing that happens is a filter to the phrase's own terms, so
    a term-partitioned index table would be partition-pruned down to
    ``len(phrase)`` terms regardless of corpus size. The pruned
    postings then collapse with ONE groupBy(doc): per-term position
    arrays (bounded by document length, not corpus size) and an array
    intersection ``p0 ∩ (p1-1) ∩ (p2-2) …`` entirely in JVM array
    expressions. No self-join per phrase term, no window, and docs
    without all terms are dropped by the array filter for free.
    """
    if len(phrase) < 2:
        raise ValueError("phrase_match_counts wants >= 2 terms")
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    ).filter(F.col("term").isin(phrase))
    pos_arrays = [
        F.sort_array(
            F.collect_list(F.when(F.col("term") == w, F.col("pos")))
        ).alias(f"p{i}")
        for i, w in enumerate(phrase)
    ]
    g = toks.groupBy(id_col).agg(*pos_arrays)
    # one-arg closure per term: a `lambda x, i=i` would be introspected
    # by F.filter as an (element, index) lambda and break resolution
    def _adjacent(i: int):
        return lambda x: F.array_contains(F.col(f"p{i}"), x + i)

    starts = F.col("p0")
    for i in range(1, len(phrase)):
        starts = F.filter(starts, _adjacent(i))
    return (
        g.select(F.col(id_col), starts.alias("starts"))
        .filter(F.size("starts") > 0)
        .select(
            id_col,
            F.size("starts").alias("n_matches"),
            F.element_at("starts", 1).alias("first_pos"),
        )
    )


def pmi_bigrams(
    df,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 25,
):
    """Collocation mining: top-k word bigrams by pointwise mutual
    information ``ln( p(ab) / (p(a) p(b)) )`` over token OCCURRENCES,
    with a minimum bigram count floor (raw PMI without a floor just
    surfaces hapaxes). Complements ``a05_bigram_counts`` (document-
    frequency ranked): PMI finds pairs that co-occur far above chance
    even when absolutely rare — the phrase/named-entity signal a
    tokenizer or n-gram blocklist wants.

    Scale shape: three column-pruned passes over the text column —
    unigram explode, adjacent-zip bigram explode, and a no-explode
    token-total scan — each collapsing map-side before any shuffle.
    The unigram relation is vocabulary-sized, checkpointed once (it
    feeds the total and BOTH join sides), and joined onto the
    floor-filtered bigrams via broadcast; the two totals ride along as
    broadcast one-row relations. Final ordering is on round(pmi, 6)
    with the bigram as tie-break, so the top-k cut is deterministic
    across engines.
    """
    from pyspark.sql import functions as F

    toks = df.select(tokens(F.col(text_col)).alias("ws")).filter(
        F.size("ws") >= 1
    )
    uni = (
        toks.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    t_total = uni.agg(F.sum("c").cast("double").alias("t_tok"))
    w = F.col("ws")
    pairs = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda j: F.concat_ws(
                " ", F.element_at(w, j), F.element_at(w, j + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    big = (
        toks.select(F.explode(pairs).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    b_total = (
        toks.select(
            F.greatest(F.size("ws") - 1, F.lit(0)).alias("nb")
        )
        .agg(F.sum("nb").cast("double").alias("t_big"))
    )
    ua = F.broadcast(uni.select(F.col("w").alias("wa"), F.col("c").alias("c_a")))
    ub = F.broadcast(uni.select(F.col("w").alias("wb"), F.col("c").alias("c_b")))
    scored = (
        big.withColumn("wa", F.split("bigram", " ")[0])
        .withColumn("wb", F.split("bigram", " ")[1])
        .join(ua, "wa")
        .join(ub, "wb")
        .crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(b_total))
        .select(
            "bigram",
            "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab") / F.col("t_big"))
                    / (
                        (F.col("c_a") / F.col("t_tok"))
                        * (F.col("c_b") / F.col("t_tok"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("bigram")).limit(top_k)


def sentence_count(text: Column) -> Column:
    """Sentence count for readability scoring: the number of
    terminal-punctuation runs (``[.!?]+``), floored at 1 so an
    unpunctuated fragment still counts as one sentence. A pure
    column expression (no UDF); DuckDB twin is
    ``greatest(len(regexp_extract_all(text, '[.!?]+')), 1)``."""
    return F.greatest(
        F.size(F.regexp_extract_all(text, F.lit(r"[.!?]+"), F.lit(0))),
        F.lit(1),
    )


def syllable_count(text: Column) -> Column:
    """Heuristic syllable count: per whitespace token, the number of
    vowel-group runs (``[aeiouy]+``, case-folded) floored at 1 (every
    word carries at least one syllable), summed over the document.
    The standard cheap Flesch estimator — deterministic and
    engine-portable (a higher-order array expression, no UDF)."""
    per_word = F.transform(
        tokens(text),
        lambda w: F.greatest(
            F.size(
                F.regexp_extract_all(
                    F.lower(w), F.lit(r"[aeiouy]+"), F.lit(0)
                )
            ),
            F.lit(1),
        ),
    )
    return F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x)
