"""Deduplication operators for large-scale training-data pipelines.

Exact (hash groupBy), MinHash+LSH, SimHash, and n-gram Jaccard — all
expressed as declarative DataFrame plans:

- **Exact** is one partial-aggregated groupBy on a 256-bit content hash;
  at 100 TB the shuffle carries (hash, min_id) pairs only, never text.
- **MinHash+LSH** is the scale path for near-dup: shingle → 16-perm
  signature (narrow, per-row), band → explode (×4), bucket self-join
  (shuffle on band key — bounded, because bucket sizes are the only
  quadratic term), then exact-Jaccard verification of candidates only.
- **SimHash** gives a 64-bit per-doc fingerprint; near-dup = small
  Hamming distance, found by pigeonhole banding on 16-bit chunks
  (any pair within distance d < 4 shares at least one of 4 chunks).
- **n-gram Jaccard** (all-pairs on shared shingles) is the exact
  quadratic baseline used to validate the sketches at test scale.

All hashes go through :mod:`hashing` so every operator here has a
DuckDB-SQL oracle twin in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.hashing import (
    LSH_BANDS,
    LSH_ROWS_PER_BAND,
    MINHASH_PERMS,
    MINHASH_PRIME,
    hash60,
)

# Cache lifecycle seam (r11): operators here pin intermediates their
# returned plan reads 2-4x; `released_after()` bounds the pins' life
# to a caller scope. Shared with the other pinning operators —
# implementation and rationale live in operators/caching.py;
# re-exported here because the dedup family is the primary user.
from mcyj_datapipeline_spark.operators.caching import (  # noqa: F401
    pin as _pin,
    released_after,
)


def exact_dedup_winners(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: one surviving (minimum) id per distinct content hash,
    plus the duplicate count. groupBy on sha2 — map-side partial agg,
    shuffle of digests only."""
    return (
        df.select(
            F.sha2(F.col(text_col), 256).alias("content_sha"), F.col(id_col)
        )
        .groupBy("content_sha")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams of a space-tokenized text column. Texts
    shorter than ``n`` words yield an EMPTY array — the guard matters:
    ``sequence(1, 0)`` DESCENDS in Spark, so without it a short text
    (e.g. a partial tail chunk from :func:`chunk_documents`) would feed
    ``slice`` a zero start and fail the whole stage."""
    words = F.split(text, " ")
    k = F.size(words) - (n - 1)
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def hash_shingle_array(sh: Column) -> Column:
    """Distinct hashes (mod MINHASH_PRIME) of an ALREADY-MATERIALIZED
    shingle-string array — the seam that lets one persisted
    :func:`word_shingles` relation feed both the exact string spine
    and the MinHash spine without re-shingling (r10, the
    dedup_minhash_eval two-pass cut). ``array_distinct`` AFTER hashing:
    the input strings are distinct, but a 60-bit collision would
    otherwise leave duplicate hashes and skew set sizes."""
    return F.array_distinct(
        F.transform(sh, lambda s: hash60(s) % MINHASH_PRIME)
    )


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct shingle hashes reduced mod MINHASH_PRIME."""
    return hash_shingle_array(word_shingles(text, n))


def minhash_signature(hashes: Column) -> Column:
    """16-permutation MinHash signature: sig_i = min((a_i*x + b_i) mod P)."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    hashes, lambda x: (F.lit(a) * x + F.lit(b)) % MINHASH_PRIME
                )
            )
            for a, b in MINHASH_PERMS
        ]
    )


def _spread_for_compute(df: DataFrame, key: str) -> DataFrame:
    """Sketch stages are CPU-bound — see
    :func:`mcyj_datapipeline_spark.operators.partitioning.spread_for_compute`."""
    from mcyj_datapipeline_spark.operators.partitioning import (
        spread_for_compute,
    )

    return spread_for_compute(df, key)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document (id, shingle-hash set, MinHash signature).

    Shape: shingle → explode → one groupBy(doc) computing BOTH the
    shingle set (``collect_list`` — input is already distinct) and the 16
    permuted ``min`` aggregates. Flat (id, hash) rows keep the codegen
    span small (vs 16 unrolled ``transform`` lambdas in
    :func:`minhash_signature`, kept for composability), the aggregation
    partial-aggregates map-side, and the shingles are hashed exactly
    once. Docs with no shingles disappear at the explode, matching the
    old ``size > 0`` filter.

    ``shingles_df`` (r10): an optional pre-materialized
    ``(id_col, sh)`` relation of :func:`word_shingles` string arrays;
    when given, the string shingling is SKIPPED and only the (cheap)
    hash transform runs here. Semantics identical: the hash set is
    ``array_distinct(hash60(s) % P)`` either way. Measured caveat
    before reaching for it (r10): DataFrame-CACHING a corpus-sized
    string-array relation to share it costs more than re-shingling
    from text on this engine (cache write 15 s vs ~4 s/pass at sf1),
    so the seam pays only when the shingle relation is already
    materialized for other reasons (a table, a checkpoint) — the
    eval job that motivated it went back to independent text passes.

    The hash array MUST stay inline inside the explode (r10
    regression fix): naming it in its own projection turns the
    generator child into a plain attribute, which lets Spark's
    InferFiltersFromGenerate rule add a ``size(_hs) > 0`` filter
    that constraint propagation then pushes below the repartition —
    RE-EVALUATING the whole shingle+hash expression a second time
    pre-shuffle (measured 4.4x on this function, and it rippled into
    every LSH-spine query in BENCH: lsh_pairs 0.94→2.26 s at sf0.1).
    The rule skips non-attribute generator children, so the inline
    form evaluates the expression exactly once."""
    if shingles_df is not None:
        ex = shingles_df.select(
            F.col(id_col),
            F.explode(hash_shingle_array(F.col("sh"))).alias("h"),
        )
    else:
        ex = _spread_for_compute(
            df.select(F.col(id_col), F.col(text_col)), id_col
        ).select(
            F.col(id_col),
            F.explode(shingle_hashes(F.col(text_col), n)).alias("h"),
        )
    return ex.groupBy(id_col).agg(
        F.collect_list("h").alias("shingles"),
        F.array(
            *[
                F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_PRIME)
                for a, b in MINHASH_PERMS
            ]
        ).alias("signature"),
    )


def lsh_bands(sig_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Explode each signature into LSH_BANDS band keys."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.col("signature")[b * LSH_ROWS_PER_BAND + r]
                        for r in range(LSH_ROWS_PER_BAND)
                    ],
                ).alias("band_key"),
            )
            for b in range(LSH_BANDS)
        ]
    )
    return sig_df.select(id_col, F.explode(bands).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    jaccard_threshold: float = 0.8,
    max_bucket_size: int | None = None,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, verified with exact Jaccard.

    Candidate generation is the banded bucket self-join (sub-quadratic:
    only same-bucket pairs are formed); verification joins the shingle
    sets back and keeps pairs with true Jaccard ≥ threshold. Returns
    (id_a, id_b, jaccard) with id_a < id_b, deduped across bands.

    ``max_bucket_size`` is the web-corpus safety valve: boilerplate
    shingles (headers, licenses) can put millions of docs in one bucket,
    turning the per-bucket quadratic term into THE cost. Capping drops
    buckets larger than the limit from candidate generation — a recall
    trade documented at the call site; pairs those buckets would have
    produced usually also share a non-degenerate bucket in another band.

    The signature relation is persisted: it feeds the self-join twice
    plus the verification join twice, and recomputing the md5-per-
    shingle subtree 4× dominates runtime otherwise (at cluster scale
    you would materialize signatures to a table for the same reason).
    Wrap call + materialization in :func:`released_after` to drop the
    pin on scope exit; outside a scope the caller owns the cache.

    ``shingles_df``: optional pre-materialized ``(id_col, sh)`` string
    -shingle relation, forwarded to :func:`minhash_signatures` — lets
    a caller that ALSO needs the string shingles (the eval queries)
    shingle the corpus exactly once."""
    sigs = _pin(
        minhash_signatures(df, text_col, id_col, n, shingles_df=shingles_df)
    )
    bands = lsh_bands(sigs, id_col)
    if max_bucket_size is not None:
        sizes = bands.groupBy("band", "band_key").agg(
            F.count(F.lit(1)).alias("_bucket_n")
        )
        bands = (
            bands.join(sizes, on=["band", "band_key"])
            .filter(F.col("_bucket_n") <= max_bucket_size)
            .drop("_bucket_n")
        )
    left = bands.select(
        F.col("band"), F.col("band_key"), F.col(id_col).alias("id_a")
    )
    right = bands.select(
        F.col("band"), F.col("band_key"), F.col(id_col).alias("id_b")
    )
    candidates = (
        left.join(right, on=["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sh = sigs.select(F.col(id_col), F.col("shingles"))
    verified = (
        candidates.join(
            sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")),
            on="id_a",
        )
        .join(
            sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")),
            on="id_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_docs: int | None = None,
    metric: str = "jaccard",
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via shared-shingle inverted
    index: explode shingles, self-join on shingle (pairs sharing ≥1
    shingle only — never a full cross join), count shared, then
    |A∩B| / (|A| + |B| − |A∩B|). The quadratic baseline that validates
    MinHash at test scale.

    ``max_shingle_docs`` is the same safety valve as MinHash's
    ``max_bucket_size``, applied to the inverted index: a shingle that
    appears in k documents fans out into k·(k−1)/2 candidate rows in the
    self-join, so one boilerplate shingle (header, license line) shared
    by a million web documents would alone generate ~5·10¹¹ join rows.
    Capping drops shingles whose document frequency exceeds the limit
    BEFORE the self-join, bounding per-shingle fan-out at
    max_shingle_docs²/2. With the cap, ``shared`` undercounts pairs
    whose only common shingles were ultra-frequent — the standard
    stop-shingle recall trade; ``None`` (default) keeps the function an
    exact baseline for oracle parity at test scale.

    ``metric``: ``"jaccard"`` (|A∩B| / |A∪B|) scores whole-document
    similarity; ``"containment"`` (|A∩B| / min(|A|,|B|)) scores how
    much of the SMALLER document sits inside the larger — the right
    signal for subset duplication (an abstract inside a paper, a quote
    inside an article), where Jaccard stays low because the union is
    dominated by the larger document.

    ``shingles_df``: optional pre-materialized ``(id_col, sh)``
    relation of :func:`word_shingles` arrays (already
    size>0-filtered). Measured caveat (r10): DataFrame-caching a
    corpus-sized string-array relation to share it costs more than
    re-shingling from text (15 s cache write vs ~4 s/pass at sf1) —
    pass one only when it is already materialized for other
    reasons."""
    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown metric: {metric!r}")
    if shingles_df is not None:
        sh = shingles_df.select(F.col(id_col), F.col("sh"))
    else:
        sh = _spread_for_compute(
            df.select(F.col(id_col), F.col(text_col)), id_col
        ).select(
            F.col(id_col), word_shingles(F.col(text_col), n).alias("sh")
        ).filter(F.size("sh") > 0)
    sizes = sh.select(F.col(id_col), F.size("sh").alias("n_sh"))
    inv = sh.select(F.col(id_col), F.explode("sh").alias("shingle"))
    if max_shingle_docs is not None:
        freq = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        inv = (
            inv.join(freq, on="shingle")
            .filter(F.col("_df") <= max_shingle_docs)
            .drop("_df")
        )
    shared = (
        inv.alias("x")
        .join(inv.alias("y"), on="shingle")
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .groupBy(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    out = (
        shared.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na")),
            on="id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb")),
            on="id_b",
        )
        .withColumn(
            "score",
            F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
            if metric == "jaccard"
            else F.col("shared") / F.least(F.col("na"), F.col("nb")),
        )
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", F.round("score", 6).alias(metric))
    )
    return out


def token_hashes(text: Column) -> Column:
    """Distinct token hashes for SimHash."""
    return F.transform(F.array_distinct(F.split(text, " ")), lambda t: hash60(t))


def simhash64(hashes: Column) -> Column:
    """60-bit SimHash from a MATERIALIZED token-hash array: for each bit
    position, majority vote of token-hash bits (+1/−1), bit set iff
    sum > 0. Takes the hash array as a column (not the text) so the md5
    subtree is computed once per row — inlining it would re-evaluate the
    hashing inside each of the 60 vote folds (a measured 60× blowup).

    Expression form kept for composability; :func:`simhash_signatures`
    uses the explode+aggregate form (60 tiny ``sum`` aggregates over flat
    rows) whose codegen is dramatically smaller than 60 unrolled
    ``aggregate`` folds."""
    def vote_for_bit(i: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(
                F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1),
        )

    terms = []
    for i in range(60):
        terms.append(
            F.when(vote_for_bit(i) > 0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document 60-bit SimHash via explode + 60-way vote aggregation:
    token-hash rows → ``sum(±1)`` per bit (map-side partial agg; shuffle
    carries (id, 60 ints) per doc) → one projection reassembling the
    signature. Same values as :func:`simhash64`, flat codegen."""
    ex = (
        _spread_for_compute(df.select(F.col(id_col), F.col(text_col)), id_col)
        .select(F.col(id_col), F.explode(token_hashes(F.col(text_col))).alias("h"))
    )
    votes = ex.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(60)
        ]
    )
    sig = None
    for i in range(60):
        term = F.when(
            F.col(f"v{i}") > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return votes.select(F.col(id_col), sig.alias("sig"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: band the 60-bit fingerprint into
    ``max_hamming + 1`` near-equal chunks; by pigeonhole any pair with
    Hamming distance ≤ ``max_hamming`` agrees on ≥1 chunk, so the chunk
    self-join finds ALL such pairs without a cross join — the chunk
    count adapts to the requested radius rather than silently missing
    pairs beyond a fixed banding's guarantee. Verify with exact
    ``bit_count(xor)``. (Wider radii explode more rows per doc and
    coarser chunks collide more — recall stays total, candidate cost
    grows; beyond 30 chunks (radius >= 30) chunks shrink under 2 bits
    and the banding degenerates toward all-pairs, so refuse it.)

    Two-step projection: materialize the token-hash array first, then
    fold the 60 bit votes over it — one md5 pass per token total.
    Persisted: the chunk explode and both sides of the self-join would
    otherwise re-inline (CollapseProject) the 60-fold signature
    expression several times over. (Pin lifecycle: wrap in
    :func:`released_after` to drop it on scope exit; otherwise it
    lives until the session clears it — long-lived drivers screening
    many batches should ``spark.catalog.clearCache()`` between
    rounds, as bench.py does.)"""
    n_chunks = max_hamming + 1
    if not 1 <= n_chunks <= 30:
        raise ValueError(
            f"max_hamming={max_hamming}: must be in 0..29 (1..30 chunks "
            "of >= 2 bits — beyond that the banding degenerates toward "
            "all-pairs)"
        )
    base, extra = divmod(60, n_chunks)
    spans = []  # (shift, width) per chunk, covering all 60 bits
    shift = 0
    for c in range(n_chunks):
        width = base + (1 if c < extra else 0)
        spans.append((shift, width))
        shift += width
    sigs = _pin(simhash_signatures(df, text_col, id_col))
    chunks = sigs.select(
        id_col,
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("sig"), sh)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("chunk_val"),
                    )
                    for c, (sh, w) in enumerate(spans)
                ]
            )
        ).alias("ck"),
    ).select(id_col, "sig", F.col("ck.chunk").alias("chunk"), F.col("ck.chunk_val").alias("chunk_val"))
    a = chunks.select(
        "chunk", "chunk_val", F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a")
    )
    b = chunks.select(
        "chunk", "chunk_val", F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b")
    )
    return (
        a.join(b, on=["chunk", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def normalized_text(text: Column) -> Column:
    """Dedup normalization (the C4/RefinedWeb-style canonical form):
    lowercase, strip non-alphanumerics to spaces, collapse whitespace.
    Catches trivial reformattings that defeat byte-exact hashing."""
    lowered = F.lower(text)
    stripped = F.regexp_replace(lowered, r"[^a-z0-9]+", " ")
    return F.trim(stripped)


def fuzzy_exact_dedup_winners(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup over the NORMALIZED text: same one-shuffle hash
    groupBy as :func:`exact_dedup_winners`, keyed on the canonical form
    — the cheap middle ground between byte-exact and MinHash."""
    return (
        df.select(
            F.sha2(normalized_text(F.col(text_col)), 256).alias("norm_sha"),
            F.col(id_col),
        )
        .groupBy("norm_sha")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 50,
    jump_after: int = 6,
    check_every: int = 2,
    _stats: dict | None = None,
) -> DataFrame:
    """Duplicate-cluster formation: connected components over a candidate
    -pair edge list (e.g. :func:`minhash_lsh_pairs` output), by iterative
    min-label propagation. Returns ``(node, component)`` where component
    is the minimum node id reachable — the cluster's canonical "keep" id.

    Each iteration is ONE shuffle join (labels against the undirected
    edge list) + a groupBy-min, and converges in O(max cluster diameter)
    rounds — near-dup clusters are shallow (usually <= 3-4 hops), so a
    handful of rounds suffice even at 100 TB.

    Deep-graph valve: plain propagation moves the min label ONE hop per
    round, so a pathological chain (diameter ≫ rounds) would dominate.
    If convergence hasn't happened after ``jump_after`` rounds, each
    subsequent round adds a pointer-jumping step — ``comp ← comp[comp]``
    via one extra self-join on the (node, comp) relation — which doubles
    the propagated distance per round (O(log diameter) to converge, the
    same acceleration the alternating large-star/small-star scheme
    gets). The invariants that make it safe: comp(x) ≤ x always, and
    comp(x) is always a member of x's component, so the fixpoint
    (neighbor-min changes nothing) is the component minimum either way.

    ``localCheckpoint`` truncates lineage so plan size stays constant;
    on a real cluster use ``spark.sparkContext.setCheckpointDir`` +
    ``checkpoint`` for fault-tolerant truncation instead.

    Driver-sync pacing: the convergence ``count()`` is a full driver
    round-trip (job submit + scheduling + result), and on an iterative
    query those syncs — not the per-round data volume — dominate at
    small scale and add latency at any scale. ``check_every`` batches
    that check: propagation rounds chain LAZILY (constant plan depth ≤
    ``check_every`` rounds between checkpoints) and only every
    ``check_every``-th round materializes + counts, so the job count
    per converged run roughly halves at the default of 2. Worst case it
    runs ``check_every - 1`` extra (idempotent) rounds past the
    fixpoint — min-label propagation is monotone, so extra rounds
    change nothing. ``_stats`` (tests/profiling) receives
    {"rounds": n, "syncs": m} when provided.
    """
    # lazy checkpoints: materialized by the FIRST convergence-check job
    # instead of two eager upfront jobs, then reused every round
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )

    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )

    rounds = 0
    syncs = 0
    for i in range(max_iters):
        # candidate label for each node = min over neighbors' current comp
        nbr = (
            und.join(labels, und["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        upd = labels.join(nbr, labels["node"] == nbr["u"], "left").select(
            "node",
            "comp",
            F.least(
                F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
            ).alias("new_comp"),
        )
        if i >= jump_after:
            # pointer jump on THIS round's labels: comp ← comp[comp]
            ptr = upd.select(
                F.col("node").alias("p_node"), F.col("new_comp").alias("p_comp")
            )
            upd = upd.join(
                ptr, upd["new_comp"] == ptr["p_node"], "left"
            ).select(
                "node",
                "comp",
                F.coalesce("p_comp", F.col("new_comp")).alias("new_comp"),
            )
        rounds = i + 1
        if rounds % check_every == 0 or rounds == max_iters:
            # lazy checkpoint: the convergence count materializes it,
            # so each CHECK costs one job covering check_every rounds
            upd = upd.localCheckpoint(eager=False)
            n_changed = upd.filter(
                F.col("new_comp") != F.col("comp")
            ).count()
            syncs += 1
            labels = upd.select("node", F.col("new_comp").alias("comp"))
            if n_changed == 0:
                break
        else:
            labels = upd.select("node", F.col("new_comp").alias("comp"))

    if _stats is not None:
        _stats["rounds"] = rounds
        _stats["syncs"] = syncs
    return labels.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("cluster_id")
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_collisions: int = 2,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing >=
    ``min_collisions`` distinct word n-grams with ANY benchmark doc
    (the GPT-3-style n-gram collision test, scaled down from 13-grams
    to fit short test docs).

    Plan: both sides explode to distinct shingle hashes; the join is on
    the shingle hash (the benchmark side is tiny in practice — the
    shuffle carries hashed shingles, never text — and AQE broadcasts
    it); collisions count DISTINCT shingles so repeated n-grams within
    a doc don't inflate the score. At 100 TB the corpus side is the
    same explode→groupBy spine as MinHash, so the two passes share the
    shingle relation if materialized."""
    # shingle_hashes is array_distinct per document, so the exploded
    # (id, sh) rows are already unique — no corpus-wide distinct needed
    # (it would be a full hash-aggregate shuffle that removes nothing)
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.explode(shingle_hashes(F.col(text_col), n)).alias("sh"),
    )
    b = benchmark.select(
        F.col(id_col).alias("bench_id"),
        F.explode(shingle_hashes(F.col(text_col), n)).alias("sh"),
    )
    return (
        c.join(b, "sh")
        .groupBy("corpus_id")
        .agg(
            F.countDistinct("sh").alias("n_collisions"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .filter(F.col("n_collisions") >= min_collisions)
    )


def minhash_lsh_pairs_incremental(
    new_df: DataFrame,
    existing_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    jaccard_threshold: float = 0.8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Incremental near-dup screening: candidate pairs between a NEW
    batch and the EXISTING corpus only — the production shape for a
    growing corpus, where re-running the full self-join over 100 TB per
    ingest batch is the thing to avoid. Returns (new_id, existing_id,
    jaccard) with true Jaccard ≥ threshold.

    The banded join is new-bands ⋈ existing-bands (never existing ⋈
    existing, which was already screened when those docs arrived), so
    per-batch cost is |batch| × bucket-collision-rate, independent of
    corpus size except through bucket width. At cluster scale the
    existing side's (id, shingles, signature) relation is PERSISTED —
    computed once per doc at ingest (exactly what
    :func:`minhash_signatures` produces; store it partitioned by band
    key) — and only the new batch is sketched fresh. ``max_bucket_size``
    caps boilerplate buckets as in :func:`minhash_lsh_pairs`, measured
    on the existing side (the accumulating one)."""
    sig_new = _pin(minhash_signatures(new_df, text_col, id_col, n))
    sig_old = _pin(minhash_signatures(existing_df, text_col, id_col, n))
    return minhash_lsh_pairs_presketched(
        sig_new, sig_old, id_col, jaccard_threshold, max_bucket_size
    )


def minhash_lsh_pairs_presketched(
    sig_new: DataFrame,
    sig_old: DataFrame,
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """The incremental screen over PRE-SKETCHED sides: both inputs are
    ``(id, shingles, signature)`` relations as produced by
    :func:`minhash_signatures`. This is the true 100 TB fold shape —
    the existing side comes from a persisted signature STATE table
    (written once per doc at ingest), so a nightly batch never re-reads
    or re-shingles prior text; only the new batch is sketched fresh.
    Semantics identical to :func:`minhash_lsh_pairs_incremental`
    (signatures are deterministic in the text, and verification uses
    order-insensitive set intersection over the stored shingle sets)."""
    bands_new = lsh_bands(sig_new, id_col).select(
        "band", "band_key", F.col(id_col).alias("new_id")
    )
    bands_old = lsh_bands(sig_old, id_col).select(
        "band", "band_key", F.col(id_col).alias("existing_id")
    )
    if max_bucket_size is not None:
        sizes = bands_old.groupBy("band", "band_key").agg(
            F.count(F.lit(1)).alias("_n")
        )
        bands_old = (
            bands_old.join(sizes, on=["band", "band_key"])
            .filter(F.col("_n") <= max_bucket_size)
            .drop("_n")
        )
    candidates = (
        bands_new.join(bands_old, on=["band", "band_key"])
        .select("new_id", "existing_id")
        .distinct()
    )
    verified = (
        candidates.join(
            sig_new.select(
                F.col(id_col).alias("new_id"), F.col("shingles").alias("sh_n")
            ),
            on="new_id",
        )
        .join(
            sig_old.select(
                F.col(id_col).alias("existing_id"),
                F.col("shingles").alias("sh_e"),
            ),
            on="existing_id",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_n", "sh_e"))
            / F.size(F.array_union("sh_n", "sh_e")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("new_id", "existing_id", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


def chunk_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 30,
    stride: int = 30,
    jaccard_threshold: float = 0.8,
    id_mult: int = 100_000,
) -> DataFrame:
    """Partial-document duplication: MinHash near-dup detection at
    CHUNK granularity. Document-level sketches miss a page copied into
    an otherwise-different document (the containment problem — overall
    Jaccard stays low); chunking first bounds the comparison unit, so
    any lifted passage surfaces as a chunk-level near-dup pair.

    Pipeline: :func:`text_analysis.chunk_documents` (disjoint windows
    by default) → composite chunk ids (doc·id_mult + chunk_idx) →
    :func:`minhash_lsh_pairs` over the chunks → map back to document
    pairs, drop within-document hits, count matching chunks. Returns
    (id_a, id_b, n_chunk_hits) with id_a < id_b. Cost scales with
    chunk count × LSH bucket density — same banded shape as doc-level,
    just a finer unit; at 100 TB chunk signatures persist beside the
    doc signatures."""
    from mcyj_datapipeline_spark.operators.text_analysis import (
        chunk_documents,
    )

    id_type = dict(df.dtypes).get(id_col, "")
    if id_type not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise ValueError(
            f"chunk_near_dup_pairs needs an integer {id_col!r} for the "
            f"composite chunk id (got {id_type!r}); map string ids to a "
            "dense integer surrogate first"
        )
    chunks = chunk_documents(df, text_col, id_col, chunk_size, stride)
    # composite id = doc*id_mult + idx: cap idx so a pathologically long
    # document can never overflow into the next doc's id space (the
    # chunks beyond the cap are skipped — documented truncation, not
    # silent cross-document corruption)
    chunks = chunks.filter(F.col("chunk_idx") < id_mult)
    ch = chunks.select(
        (F.col(id_col) * id_mult + F.col("chunk_idx")).alias("doc_id"),
        F.col("chunk").alias("text"),
    )
    pairs = minhash_lsh_pairs(
        ch, jaccard_threshold=jaccard_threshold
    )
    da = F.expr(f"id_a div {id_mult}")
    db = F.expr(f"id_b div {id_mult}")
    return (
        pairs.select(
            F.least(da, db).alias("id_a"), F.greatest(da, db).alias("id_b")
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_chunk_hits"))
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = None,
    window: int = 3,
    prefix_len: int = 12,
    min_len_ratio: float = 0.8,
    reverse_key: bool = False,
) -> DataFrame:
    """Sorted-Neighborhood Method (SNM) candidate pairs: normalize the
    text into a sort key, order records within a block, and compare each
    record only to its ``window`` predecessors — the classic
    record-linkage blocking that turns an O(n^2) compare into O(n·w).

    A pair is emitted when the two sort keys share a ``prefix_len``-char
    prefix and their lengths agree within ``min_len_ratio`` — a cheap,
    fully JVM-side pre-filter; feed survivors to an exact verifier
    (n-gram Jaccard / edit distance) as usual for SNM.

    Output: ``(id_a, id_b, block, len_ratio)`` with ``id_a`` the earlier
    row in sort order.

    Scale shape: the window is partitioned by ``(block_col, first sort-
    key char)`` — never a global sort — so each partition sorts locally
    after one shuffle, and the ``window`` lags are per-partition
    pointer reads. Like all single-pass SNM, pairs straddling a block
    boundary are missed by design; multi-pass with rotated keys is the
    standard recall fix and is just another call with a different
    ``block_col``/key. At 100 TB the block key bounds both skew and
    memory: blocks are (lang x leading char) — thousands of groups —
    and no group ever materializes more than its own rows.
    """
    from pyspark.sql.window import Window

    sk = snm_sort_key(F.col(text_col))
    if reverse_key:
        # multi-pass SNM: a second pass sorted on the REVERSED key
        # catches near-dups whose edits hit the prefix (single-pass
        # SNM's blind spot); union the passes for recall
        sk = F.reverse(sk)
    cols = [F.col(id_col).alias("_id"), sk.alias("_sk")]
    part_cols = [F.substring("_sk", 1, 1)]
    if block_col is not None:
        cols.append(F.col(block_col).alias("_block"))
        part_cols.insert(0, F.col("_block"))
    base = df.select(*cols)
    w = Window.partitionBy(*part_cols).orderBy("_sk", "_id")
    lagged = base
    for i in range(1, window + 1):
        lagged = lagged.withColumn(
            f"_p{i}",
            F.struct(
                F.lag("_id", i).over(w).alias("id"),
                F.lag("_sk", i).over(w).alias("sk"),
            ),
        )
    prev = F.explode(
        F.array(*[F.col(f"_p{i}") for i in range(1, window + 1)])
    )
    cand = lagged.withColumn("_prev", prev).filter(
        F.col("_prev.id").isNotNull()
    )
    la, lb = F.length("_prev.sk"), F.length("_sk")
    ratio = F.least(la, lb).cast("double") / F.greatest(la, lb)
    out_block = (
        [F.col("_block").alias("block")] if block_col is not None else []
    )
    return cand.filter(
        (
            F.substring("_prev.sk", 1, prefix_len)
            == F.substring("_sk", 1, prefix_len)
        )
        & (F.greatest(la, lb) > 0)
        & (ratio >= min_len_ratio)
    ).select(
        F.col("_prev.id").alias("id_a"),
        F.col("_id").alias("id_b"),
        *out_block,
        F.round(ratio, 4).alias("len_ratio"),
    )


def snm_sort_key(col: Column) -> Column:
    """The SNM normalization: lowercase, collapse every non-alnum run
    to one space, trim. Shared by :func:`sorted_neighborhood_pairs`
    and the entity-resolution pipeline's scoring stage so candidates
    and scores always see the SAME canonical string."""
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def _positional_ngrams(w, n: int):
    """Positional word n-grams of a token array column: element i
    (1-based after posexplode) covers words i..i+n-1 joined by ' '.
    Built by zipping n aligned slices (one subarray allocation per
    DOC) — the per-position ``concat_ws(slice(w, i, n))`` form
    allocates a fresh n-element array per GRAM, measurably slower in
    the interpreted higher-order-function path (~13% of the span
    queries' sf1 wall). Texts shorter than n words yield []."""
    k = F.size(w) - (n - 1)
    m = F.greatest(k, F.lit(1))
    z = F.arrays_zip(*[F.slice(w, i + 1, m) for i in range(n)])
    return F.when(
        k >= 1,
        F.transform(
            z,
            lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _docspan_agg(gdf: DataFrame, key: str, id_col: str, min_docs: int):
    """(key, min-doc owner) for keys spanning >= ``min_docs`` distinct
    docs. For the ubiquitous ``min_docs == 2`` the distinct-doc test
    is ``min(id) != max(id)`` — plain min/max partials, no
    countDistinct Expand (the Expand doubled the span queries' agg
    cost at sf1); the general case keeps countDistinct."""
    if min_docs == 2:
        return (
            gdf.groupBy(key)
            .agg(F.min(id_col).alias("_owner"), F.max(id_col).alias("_x"))
            .filter(F.col("_owner") != F.col("_x"))
            .select(key, "_owner")
        )
    return (
        gdf.groupBy(key)
        .agg(
            F.countDistinct(id_col).alias("_nd"),
            F.min(id_col).alias("_owner"),
        )
        .filter(F.col("_nd") >= min_docs)
        .select(key, "_owner")
    )


def repeated_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
    hash_first: bool = False,
) -> DataFrame:
    """Exact-substring duplicate SPANS: for every document, the merged
    word ranges covered by n-grams that also occur in at least
    ``min_docs`` distinct documents — the span-level exact-dedup
    signal ("Deduplicating Training Data Makes Language Models
    Better", Lee et al. 2022) that document-level digests miss: a
    boilerplate paragraph pasted into a thousand otherwise-unique
    pages never trips a whole-doc sha but dominates the training
    distribution. Downstream either cuts the spans or drops docs whose
    spans cover too much.

    Output: one row per (doc, span) — ``span_start``/``span_end`` are
    1-based word indices (inclusive) and ``n_dup_grams`` the number of
    duplicated n-grams merged into the span. Two duplicated grams at
    positions p < q merge iff q <= p + n (their word ranges overlap or
    touch).

    Plan shape: positional n-grams via one transform+posexplode (no
    self-join), gram frequency as ONE groupBy (countDistinct over doc
    ids), a semi-join back to positions, and a per-doc window to merge
    runs — two shuffles on the gram string plus one on doc_id. The
    suffix-array construction the paper uses is a single-machine
    design; the n-gram restriction (fixed minimum match length L = n
    words) is what makes the semantics shuffle-expressible, and is the
    standard distributed relaxation.

    ``hash_first`` narrows every candidate-selection shuffle to 8-byte
    ``xxhash64(gram)`` keys (no n-word strings in the agg shuffle) and
    re-counts only the hash-duplicated subset on the exact string, so
    a collision can never promote a unique gram to duplicated — output
    identical either way. Default False (r9): the A/B at sf0.1 AND sf1
    measured the string form faster both times (sf1: 12.1 s vs 16.3 s,
    min of 3) — the extra semi-join + second aggregation pass costs
    more than the narrower rows save when shuffle is intra-host
    memcpy. Opt in on a real cluster where shuffle BYTES are the
    constrained resource (network-bound, 8-byte vs n-word rows)."""
    from pyspark.sql import Window

    from mcyj_datapipeline_spark.operators.text_analysis import tokens

    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_w"))
    grams = toks.select(
        id_col, F.posexplode(_positional_ngrams(F.col("_w"), n)).alias(
            "_p0", "gram"
        )
    ).select(id_col, (F.col("_p0") + 1).alias("pos"), "gram")

    if hash_first:
        hgrams = grams.withColumn("_gh", F.xxhash64("gram"))
        dup_h = _docspan_agg(hgrams, "_gh", id_col, min_docs).select("_gh")
        cand = hgrams.join(dup_h, "_gh", "left_semi")
        # exact confirm on the candidate subset only — collisions die here
        dup = _docspan_agg(cand, "gram", id_col, min_docs).select("gram")
        dpos = cand.join(dup, "gram", "left_semi").select(id_col, "pos")
    else:
        dup = _docspan_agg(grams, "gram", id_col, min_docs).select("gram")
        dpos = grams.join(dup, "gram", "left_semi").select(id_col, "pos")

    w = Window.partitionBy(id_col).orderBy("pos")
    runs = dpos.withColumn(
        "_brk",
        F.when(F.col("pos") - F.lag("pos").over(w) <= n, 0).otherwise(1),
    ).withColumn("_sid", F.sum("_brk").over(w))
    return (
        runs.groupBy(id_col, "_sid")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (n - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
        .drop("_sid")
    )


def cut_repeated_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
    hash_first: bool = False,
) -> DataFrame:
    """Span-level corpus REWRITE: remove every word covered by a
    corpus-duplicated n-gram from all documents except the gram's
    OWNER (the minimum doc id containing it) — the keep-one-occurrence
    cut of Lee et al. 2022, so the repeated boilerplate survives in
    exactly one place and the rest of each document is untouched. The
    owner keeps all its own occurrences (including intra-doc repeats);
    a document can lose words to several different owners at once.

    Output: one row per input document — ``n_words_before``,
    ``n_words_after``, and ``clean_text`` rebuilt from the surviving
    words in order (documents with nothing cut pass through verbatim
    modulo whitespace normalization, which the tokenizer already
    imposes).

    Plan: the positional-gram + frequency stages of
    :func:`repeated_ngram_spans`, plus a per-gram min(doc) owner
    aggregate; each foreign dup hit then contributes its START
    position only (r10 — the covered range is ``[pos, pos+n-1]`` by
    construction, so exploding the n covered word indexes per hit
    just multiplied the cut shuffle by n), one groupBy collects the
    per-doc sorted start array, and the rebuild reassembles each
    doc's own token array map-side as the concatenation of the GAP
    slices between cut spans (O(#starts) lambdas + O(#words) copy
    per doc — never a per-word × per-start membership scan).

    ``hash_first``: the cross-doc frequency pass groups on
    ``xxhash64(gram)`` — 8-byte keys and NO n-word strings in the agg
    shuffle — then only the hash-duplicated candidate subset (tiny:
    actual boilerplate plus measure-zero collisions) is re-counted and
    owner-assigned on the EXACT gram string, so a collision can never
    promote a unique gram to duplicated or misassign an owner. Output
    identical either way. Default False (r9): A/B-measured slower at
    BOTH sf0.1 and sf1 (sf1: 12.3 s vs 15.2 s, min of 3) — the extra
    narrow pass only pays where shuffle bytes cross a real network;
    opt in there."""
    from mcyj_datapipeline_spark.operators.text_analysis import tokens

    # NULL text pins to an empty token array so the output row keeps
    # the (n_words_before=0, n_words_after=0, clean_text='') contract
    # the DuckDB oracle coalesces to — otherwise size(null) -> NULL
    # leaks into both counts (ADVICE r8).
    toks = df.select(
        F.col(id_col),
        F.coalesce(
            tokens(F.col(text_col)), F.array().cast("array<string>")
        ).alias("_w"),
    )

    grams = toks.select(
        id_col, F.posexplode(_positional_ngrams(F.col("_w"), n)).alias(
            "_p0", "gram"
        )
    ).select(id_col, (F.col("_p0") + 1).alias("pos"), "gram")

    if hash_first:
        # narrow pass: which gram HASHES span >= min_docs docs. The
        # agg shuffle carries (8-byte hash, min/max id partials)
        # instead of n-word strings; dup_h is boilerplate-sized, so
        # AQE turns the semi-join into a broadcast — the gram stream
        # itself is never shuffled for candidate selection. (A
        # no-string rolling-hash front end was built and measured in
        # r10 and REJECTED: chained per-window hash lambdas run in
        # the interpreted HOF path — xxhash64 chain 4.5 s vs 3.9 s
        # string build at sf1, a bitwise rot-xor chain 34.6 s —
        # concat_ws is simply the cheapest per-window primitive
        # Spark has here.)
        grams_h = grams.withColumn("_gh", F.xxhash64("gram"))
        dup_h = _docspan_agg(grams_h, "_gh", id_col, min_docs).select(
            "_gh"
        )
        cand = grams_h.join(dup_h, "_gh", "left_semi").drop("_gh")
    else:
        cand = grams

    # owners confirmed on the exact gram STRING over the candidate
    # subset only (hash_first) or the full stream (string mode)
    owners = _docspan_agg(cand, "gram", id_col, min_docs)
    # per-doc cut SPANS as one small sorted start array (r10): a hit at
    # position p cuts exactly [p, p+n-1], so the start position alone
    # carries the whole range — the cut shuffle moves ONE row per
    # foreign hit instead of the n exploded word indexes (the word-
    # grain term behind e13's 0.75 scale exponent), and the per-word
    # membership test below scans starts (<= the old distinct-covered-
    # word set by construction: each distinct start covers >= 1 new
    # word). collect_set: the same (doc,pos) can reach here once per
    # plan, dedup is free at agg grain.
    cut_sets = (
        cand.join(owners, "gram")
        .filter(F.col(id_col) != F.col("_owner"))
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("pos")).alias("_cut"))
    )

    # MAP-SIDE rebuild as GAP SLICES (r10): the surviving text is the
    # concatenation of the word ranges BETWEEN cut spans — the head
    # gap [1, p_1-1] plus, for each start p with successor q (the
    # last start's successor coalesced to W+1), the gap
    # [p+n, q-1]. Overlapping/adjacent spans clamp to empty gaps
    # (greatest(len, 0)), so no explicit interval merging is needed,
    # and order is preserved by construction. Cost per cut doc is
    # O(#starts) lambda evaluations + O(#words) array copying —
    # replacing the r10-interim per-word exists() scan, whose
    # starts-array lambda ran #words × #starts times per doc and
    # inverted the span-shuffle saving at sf1 (measured: the nested
    # HOF was the query's biggest single cost at scale). Docs with no
    # cut set skip the rebuild entirely; _kept is materialized in its
    # own projection so size() and concat_ws() don't re-run it
    # (CollapseProject keeps non-cheap multi-referenced outputs
    # split).
    W = F.size("_w")
    succ = F.zip_with(
        "_cut",
        F.slice(F.col("_cut"), 2, F.greatest(F.size("_cut") - 1, F.lit(0))),
        lambda p, q: F.struct(
            p.alias("p"), F.coalesce(q, W + 1).alias("q")
        ),
    )
    gaps = F.flatten(
        F.transform(
            succ,
            lambda s: F.slice(
                F.col("_w"),
                s["p"] + n,
                F.greatest(s["q"] - (s["p"] + n), F.lit(0)),
            ),
        )
    )
    head = F.slice(
        F.col("_w"), 1, F.greatest(F.element_at("_cut", 1) - 1, F.lit(0))
    )
    kept = F.when(F.col("_cut").isNull(), F.col("_w")).otherwise(
        F.concat(head, gaps)
    )
    return (
        toks.join(cut_sets, id_col, "left")
        .select(
            id_col,
            F.size("_w").alias("n_words_before"),
            kept.alias("_kept"),
        )
        .select(
            id_col,
            "n_words_before",
            F.size("_kept").alias("n_words_after"),
            F.concat_ws(" ", F.col("_kept")).alias("clean_text"),
        )
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    hash_keys: bool = False,
    persist_intermediates: bool = True,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """EXACT Jaccard similar pairs via prefix filtering (the
    AllPairs/PPJoin family) — same output contract as
    :func:`ngram_jaccard_pairs`, different candidate generation: each
    document indexes only its PREFIX (its ``|r| - ceil(t*|r|) + 1``
    globally-rarest shingles under the canonical (document-frequency
    asc, shingle asc) order) instead of every shingle. Any pair with
    jaccard >= t must overlap in at least ``ceil(t*|r|)`` shingles, so
    an intersection confined to the suffix (size ``ceil(t*|r|) - 1``)
    is impossible — candidates shrink, recall stays 1.0 by theorem,
    and exact verification (array_intersect on the full sets) makes
    the result identical to the brute shared-shingle join.

    This is the EXACT counterpart to MinHash/LSH at scale: where LSH
    trades recall for bucket-bounded cost, prefix filtering keeps
    exactness and instead bounds cost by indexing rare tokens — the
    frequent boilerplate shingles that explode ngram_jaccard_pairs'
    inverted index (its ``max_shingle_docs`` valve) mostly live in
    SUFFIXES here and never reach the self-join.

    Candidates pass two further EXACT prunes before the distinct
    (r10, the PPJoin ladder — both recall 1.0 by theorem, measured
    409k -> 125k candidates at sf0.1 for 256 true pairs):

    * LENGTH filter: ``J(x,y) <= min(|x|,|y|)/max(|x|,|y|)``, so any
      pair whose set sizes differ by more than ``1/t`` is dead on
      arrival;
    * POSITIONAL filter: a prefix match at (1-based) canonical
      positions ``(i, j)`` bounds the overlap at
      ``1 + min(|x|-i, |y|-j)`` (every later shared token lies after
      both positions in the SAME global order), which must reach the
      required overlap ``ceil(t/(1+t) * (|x|+|y|))``.

    Plan (r10, one persisted relation): shingle-explode the corpus
    ONCE, shingle frequency (one groupBy), join frequencies back and
    collect each doc's canonical-sorted token array (sort_array over
    (freq, shingle) structs — grouped, never a global vocabulary
    window) into ``ordered`` — the single persisted relation that
    feeds BOTH the prefix explode and the verification joins. The
    freq join carries no hint: AQE broadcasts the vocab while it is
    small (re-shingling the narrow side is cheaper than an exchange
    there) and falls back to a shuffle join at corpus-scale vocab,
    where the groupBy and join exchanges share one shingle-keyed
    shuffle (ReuseExchange) — either way the text is scanned, split,
    and shingled a bounded number of times with nothing doc-grain
    materialized except ``ordered``. The r9 two-persist shape
    (shingle arrays + prefix rows pinned separately) spent more wall
    time WRITING its two caches than the whole query now takes —
    single-session A/B at sf0.1: 5.05 s -> 2.03 s min, warm spread
    4.4 s -> 0.3 s, row-identical output (SCALE.md r10 note).

    ``hash_keys`` runs the whole candidate pipeline — frequency
    groupBy, frequency join, per-doc canonical sort, prefix self-join
    — on ``xxhash64(shingle)`` 8-byte keys with NO shingle strings in
    any shuffled row; strings appear only in the final exact
    verification, which reads the per-doc shingle arrays straight off
    the ``sh`` frame (narrow, never shuffled by key). Token identity
    for candidate generation becomes the 64-bit hash: a collision can
    only ADD candidates (killed by exact verification), except in the
    measure-zero case where TWO distinct shingles SHARED by the same
    near-threshold pair collide — the ε-recall caveat, P ≲ |pair
    union|²/2⁶⁴ per pair, zero at any tested scale.

    Default False (r9, reverting r8): recall 1.0 BY THEOREM on string
    identity, and the A/B measured the string form no slower at sf1
    (24.5 s vs 25.3 s, min of 3) and faster AND far stabler at sf0.1
    (reps 3.2-5.0 s vs 3.6-10.3 s — the hash variant was the bench's
    lone unstable flag in r8). The hashed pipeline only pays where
    shuffle bytes cross a real network; opt in there.

    ``persist_intermediates`` (r10, default True): string path pins
    ``ordered`` (read 3x — prefix explode + both verification
    sides); hash path pins the string-shingle relation ``sh`` (read
    by the inverted index and both verification sides) AND
    ``ordered`` (read by the prefix explode). Pin lifecycle: wrap
    the call + materialization in :func:`released_after` to have
    them dropped on scope exit; outside a scope the caller owns the
    cache (``spark.catalog.clearCache()``). The r8/r9
    default flip-flop on ``hash_keys`` was never resolved by
    measurement because the UNPINNED recompute churn dominated the
    variance being A/B'd (warm spread 2.8-6.7 s at sf0.1); decision
    data in ``tools/ab_prefix_filter.py`` output, SCALE.md r10
    note.

    ``shingles_df``: optional pre-materialized ``(id_col, sh)``
    relation of :func:`word_shingles` arrays (size>0-filtered and
    persisted by the CALLER — the explode below infers a size()
    filter on it, which is cheap off a cache and a recompute
    otherwise). Lets a job that also runs the MinHash spine over the
    same shingle definition (``dedup_minhash_eval``) shingle the
    corpus exactly once. String path only."""
    t = threshold
    if shingles_df is not None and hash_keys:
        raise ValueError(
            "shingles_df is a string-path seam; the hash_keys "
            "pipeline builds its own shingle relation"
        )
    if hash_keys:
        # Opt-in network-cluster shape, unchanged structure from r9
        # (candidate pipeline entirely on 8-byte xxhash64 ids, NO
        # shingle strings in any keyed shuffle; strings appear only
        # in the final exact verification, read off the narrow
        # ``sh`` frame) — plus the r10 length/positional prunes.
        # xxhash64 is effectively injective here and array_distinct
        # keeps set semantics under any collision.
        sh = (
            _spread_for_compute(
                df.select(F.col(id_col), F.col(text_col)), id_col
            )
            .select(
                F.col(id_col),
                word_shingles(F.col(text_col), n).alias("sh"),
            )
            .filter(F.size("sh") > 0)
        )
        if persist_intermediates:
            sh = _pin(sh)
        inv = sh.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(
                    F.transform("sh", lambda s: F.xxhash64(s))
                )
            ).alias("shingle"),
        )
        freq = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        ordered = (
            inv.join(freq, "shingle")
            .groupBy(id_col)
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("_df", "shingle"))
                ).alias("_ord")
            )
            .select(
                F.col(id_col),
                F.transform("_ord", lambda s: s["shingle"]).alias("_toks"),
            )
        )
        verify_src = sh.select(
            F.col(id_col), F.col("sh").alias("_toks")
        )
    else:
        # Default string path (r10 single-persist shape): explode
        # once, frequency once, collect the canonical-sorted token
        # array once — ``ordered`` then feeds prefixes AND both
        # verification sides (array_intersect is order-blind).
        if shingles_df is not None:
            ex = shingles_df.select(
                F.col(id_col), F.explode("sh").alias("shingle")
            )
        else:
            ex = _spread_for_compute(
                df.select(F.col(id_col), F.col(text_col)), id_col
            ).select(
                F.col(id_col),
                F.explode(word_shingles(F.col(text_col), n)).alias(
                    "shingle"
                ),
            )
        freq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        ordered = (
            ex.join(freq, "shingle")
            .groupBy(id_col)
            .agg(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("_df", "shingle"))
                    ),
                    lambda s: s["shingle"],
                ).alias("_toks")
            )
        )
        verify_src = None  # ordered IS the verification source
    ordered = ordered.select(
        F.col(id_col), "_toks", F.size("_toks").alias("_sz")
    )
    if persist_intermediates:
        # one pinned relation, three readers (prefix explode + both
        # verification joins): the r9 two-persist shape spent more
        # time writing its caches than the query now takes
        ordered = _pin(ordered)
    if verify_src is None:
        verify_src = ordered.select(F.col(id_col), "_toks")

    # same 1e-9 slack as the prunes below: ceil(t*|r|) landing an ulp
    # above an exact integer would shorten the prefix by one and
    # break the recall theorem from the indexing side
    plen = (
        F.col("_sz")
        - F.ceil(F.lit(t) * F.col("_sz") - F.lit(1e-9))
        + 1
    ).cast("int")
    prefixes = ordered.select(
        F.col(id_col),
        "_sz",
        F.explode(
            F.transform(
                F.slice("_toks", 1, plen),
                lambda s, i: F.struct(
                    s.alias("shingle"), (i + 1).alias("_pos")
                ),
            )
        ).alias("ps"),
    ).select(
        F.col(id_col),
        "_sz",
        F.col("ps.shingle").alias("shingle"),
        F.col("ps._pos").alias("_pos"),
    )
    # required overlap for J >= t: o/(|x|+|y|-o) >= t  <=>
    # o >= t/(1+t) * (|x|+|y|). The 1e-9 slack keeps both prunes
    # conservative at exact-integer boundaries: t/(1+t) and t*|y| are
    # DOUBLE arithmetic, and a product that lands an ulp above an
    # exact rational boundary would otherwise ceil/compare one step
    # too high and prune a pair the (also-double) verification keeps
    # — recall 1.0 must not hinge on rounding direction.
    alpha = F.ceil(
        F.lit(t / (1.0 + t)) * (F.col("x._sz") + F.col("y._sz"))
        - F.lit(1e-9)
    )
    cands = (
        prefixes.alias("x")
        .join(prefixes.alias("y"), "shingle")
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        # length filter: J <= min/max of the set sizes
        .filter(
            F.least("x._sz", "y._sz")
            >= F.lit(t) * F.greatest("x._sz", "y._sz") - F.lit(1e-9)
        )
        # positional filter: overlap <= 1 + tokens after this match
        # on the shorter remaining side (same global order both docs)
        .filter(
            (
                F.lit(1)
                + F.least(
                    F.col("x._sz") - F.col("x._pos"),
                    F.col("y._sz") - F.col("y._pos"),
                )
            )
            >= alpha
        )
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    verified = (
        cands.join(
            verify_src.select(
                F.col(id_col).alias("id_a"), F.col("_toks").alias("_sa")
            ),
            "id_a",
        )
        .join(
            verify_src.select(
                F.col(id_col).alias("id_b"), F.col("_toks").alias("_sb")
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("_sa", "_sb")).alias("_i"),
            F.size("_sa").alias("_na"),
            F.size("_sb").alias("_nb"),
        )
        .withColumn(
            "jaccard",
            F.col("_i") / (F.col("_na") + F.col("_nb") - F.col("_i")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified
