"""Behavioral tests for dedup + similarity on constructed corpora with
KNOWN near-duplicates — validates the sketches find what they must."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators import dedup as D
from mcyj_datapipeline_spark.operators import similarity as S


def _corpus(spark):
    """40 base docs + engineered duplicates: exact copy of doc0,
    one-word-change copy of doc1, unrelated docs elsewhere."""
    rng = random.Random(99)
    vocab = [f"tok{i}" for i in range(500)]
    rows = []
    for i in range(40):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(60)]
        rows.append((i, " ".join(words)))
    rows.append((100, rows[0][1]))  # exact dup of doc 0
    near = rows[1][1].split()
    near[10] = "CHANGED"
    rows.append((101, " ".join(near)))  # near dup of doc 1
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def corpus(spark):
    return _corpus(spark).cache()


def test_exact_dedup_finds_copy(corpus):
    winners = D.exact_dedup_winners(corpus)
    dupes = winners.filter(F.col("n_copies") > 1).collect()
    assert len(dupes) == 1
    assert dupes[0]["keep_id"] == 0 and dupes[0]["n_copies"] == 2


def test_minhash_finds_known_pairs(corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.minhash_lsh_pairs(corpus, jaccard_threshold=0.5).collect()
    }
    assert (0, 100) in pairs and pairs[(0, 100)] == 1.0
    assert (1, 101) in pairs and 0.8 <= pairs[(1, 101)] < 1.0
    # No false positives among unrelated random docs.
    assert all(a in (0, 1) for a, b in pairs)


def test_ngram_jaccard_agrees_with_minhash(corpus):
    exact = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(corpus, threshold=0.5).collect()
    }
    assert exact == {(0, 100), (1, 101)}


def test_simhash_finds_exact_pair(corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_near_pairs(corpus, max_hamming=6).collect()
    }
    assert pairs.get((0, 100)) == 0
    assert (1, 101) in pairs  # one-word change → few flipped bits


def _embeddings(spark):
    rng = random.Random(7)
    rows = []
    for i in range(50):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(64)]))
    # 100 = duplicate of 0; 101 = tiny perturbation of 1.
    rows.append((100, rows[0][1]))
    rows.append((101, [x + 0.001 for x in rows[1][1]]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )


@pytest.fixture(scope="module")
def vectors(spark):
    return _embeddings(spark).cache()


def test_bruteforce_topk_finds_duplicate_first(vectors):
    out = S.cosine_topk(vectors, vectors.filter(F.col("vec_id").isin(0, 1)), k=3)
    by_query = {}
    for r in out.collect():
        by_query.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
    assert sorted(by_query[0])[0][1] == 100  # rank-1 neighbor of 0 is its copy
    assert sorted(by_query[1])[0][1] == 101
    assert sorted(by_query[0])[0][2] >= 0.999999


def test_lsh_topk_recall_on_near_dups(vectors):
    """Near-identical vectors land in the same hyperplane bucket, so the
    LSH path must recover them as rank-1 too."""
    out = S.lsh_topk(vectors, vectors.filter(F.col("vec_id").isin(0, 1)), k=3)
    rank1 = {r["query_id"]: r["neighbor_id"] for r in out.collect() if r["rank"] == 1}
    assert rank1[0] == 100
    assert rank1[1] == 101


def test_embedding_near_dup_pairs(vectors):
    pairs = {
        (r["id_a"], r["id_b"]) for r in S.embedding_near_dup_pairs(vectors, 0.999).collect()
    }
    assert (0, 100) in pairs and (1, 101) in pairs


def test_ivf_recall_against_bruteforce(spark, sf_dir):
    """IVF with nprobe=4/16 must recover a solid fraction of the exact
    top-5 (it is approximate by construction, not broken)."""
    from mcyj_datapipeline_spark.io import read_table
    from mcyj_datapipeline_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, recall


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """Hamming-1 probing can only ADD candidates, so its recall vs the
    exact top-5 must be >= the single-bucket LSH recall."""
    from mcyj_datapipeline_spark.io import read_table
    from mcyj_datapipeline_spark.operators.similarity import (
        cosine_topk,
        lsh_topk,
        lsh_topk_multiprobe,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(emb, queries, k=5).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk_multiprobe(emb, queries, k=5).collect()
    }
    r_single = len(exact & single) / len(exact)
    r_multi = len(exact & multi) / len(exact)
    assert r_multi >= r_single, (r_single, r_multi)


def test_kmeans_ivf_recall(spark, sf_dir):
    """IVF with Lloyd-refined centroids still finds a solid fraction of
    the exact top-5 and yields a valid deterministic centroid set."""
    from mcyj_datapipeline_spark.io import read_table
    from mcyj_datapipeline_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    cents = kmeans_centroids(emb, n_centroids=16, iters=2)
    assert cents.count() == 16
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, k=5, centroids=cents).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.3


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter 3, needs >1 propagation round), island 10-11,
    # singleton-free: nodes only exist via edges
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        ["id_a", "id_b"],
    )
    got = {
        (r.doc_id, r.cluster_id)
        for r in D.connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_connected_components_random_graphs_match_union_find(spark):
    """Randomized cross-check: Spark min-label propagation must agree
    with a driver-side union-find on arbitrary graphs (three seeds:
    sparse, dense, many-singleton-pairs)."""
    for seed, n_nodes, n_edges in [(1, 30, 15), (2, 25, 60), (3, 40, 12)]:
        rng = random.Random(seed)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        in_graph = {x for e in edges for x in e}
        expected = {x: find(x) for x in in_graph}
        # canonicalize: component id = min member
        comp_min = {}
        for x, r in expected.items():
            comp_min.setdefault(find(r), set()).add(x)
        want = {
            (x, min(members))
            for root, members in comp_min.items()
            for x in members
        }
        got = {
            (r.doc_id, r.cluster_id)
            for r in D.connected_components(
                spark.createDataFrame(edges, ["id_a", "id_b"])
            ).collect()
        }
        assert got == want, f"seed {seed}"


def test_connected_components_empty_edges(spark):
    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert D.connected_components(edges).count() == 0


def test_minhash_bucket_cap_drops_degenerate_buckets(spark):
    """With a bucket cap of 1 no candidate pairs can form; with no cap
    the engineered duplicates are found (default behavior unchanged)."""
    corpus = _corpus(spark)
    uncapped = D.minhash_lsh_pairs(corpus, jaccard_threshold=0.8)
    assert {(r.id_a, r.id_b) for r in uncapped.collect()} >= {(0, 100)}
    capped = D.minhash_lsh_pairs(
        corpus, jaccard_threshold=0.8, max_bucket_size=1
    )
    assert capped.count() == 0


def test_ngram_jaccard_shingle_cap_bounds_fanout(spark):
    """max_shingle_docs must drop boilerplate shingles BEFORE the
    self-join: a shingle shared by every doc otherwise fans out into
    k*(k-1)/2 candidate pairs. With the cap, the boilerplate-only pairs
    vanish while genuinely similar pairs (sharing rare shingles too)
    survive."""
    # 30 docs: identical 5-word boilerplate prefix + unique tails;
    # docs 0 and 1 additionally share a rare 10-word body.
    boiler = "terms of service apply here"
    shared_body = " ".join(f"rare{i}" for i in range(10))
    rows = []
    for i in range(30):
        tail = " ".join(f"uniq{i}_{j}" for j in range(10))
        body = shared_body if i < 2 else tail
        rows.append((i, f"{boiler} {body} {tail}"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    # Uncapped: every doc pair shares the boilerplate shingles, so the
    # inverted-index join forms all 30*29/2 candidate pairs (low
    # jaccard filters them out of the OUTPUT, but the JOIN paid for
    # them -- that is the scale hazard).
    uncapped = D.ngram_jaccard_pairs(df, threshold=0.01)
    assert uncapped.count() == 30 * 29 / 2

    # Capped at df<=5: boilerplate shingles (df=30) are dropped before
    # the join; only the genuinely-similar pair remains a candidate.
    capped = D.ngram_jaccard_pairs(df, threshold=0.01, max_shingle_docs=5)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {(0, 1)}


def test_cc_pointer_jump_converges_fast_on_deep_chain(spark):
    """A 200-node chain has diameter 199: plain one-hop min-label
    propagation would need ~199 rounds (more than max_iters). With
    pointer jumping engaged after round 6, propagation distance doubles
    per round, so the whole chain must collapse to component 0 within
    ~6 + log2(200) rounds."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], ["id_a", "id_b"]
    )
    stats = {}
    out = D.connected_components(edges, max_iters=30, _stats=stats)
    comps = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert len(comps) == 200
    assert set(comps.values()) == {0}  # one component, labeled by min id
    assert stats["rounds"] <= 20  # far fewer than the 199 diameter


def test_cc_shallow_graph_unaffected_by_jump_valve(spark):
    """Two shallow clusters + an isolated pair: identical output to the
    pre-valve behavior, converging before the jump threshold."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 20)], ["id_a", "id_b"]
    )
    stats = {}
    out = D.connected_components(edges, _stats=stats)
    comps = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}
    assert stats["rounds"] <= 4


def test_quantize_int8_roundtrip_error_bounded(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.125, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        ["vec_id", "e"],
    )
    out = df.select(
        "vec_id",
        S.dequantize_int8(S.quantize_int8(F.col("e"))).alias("deq"),
        "e",
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    # Max quantization error for symmetric int8 is max_abs/254.
    errs = [
        abs(a - b) for a, b in zip(by_id[1]["e"], by_id[1]["deq"])
    ]
    assert max(errs) <= 0.5 / 254 + 1e-12
    assert by_id[2]["deq"] == [0.0, 0.0, 0.0, 0.0]  # zero vector stable


def test_l2_normalize_unit_norm(spark):
    df = spark.createDataFrame([(1, [3.0, 4.0]), (2, [0.0, 0.0])], ["i", "e"])
    rows = {r["i"]: r["n"] for r in df.select(
        "i", S.norm(S.l2_normalize(F.col("e"))).alias("n")).collect()}
    assert abs(rows[1] - 1.0) < 1e-12
    assert rows[2] == 0.0  # zero vector passes through


def test_mixture_resample_hits_target_shares(spark):
    """Rebalancing a 80/20 corpus to 50/50 must produce (approximately)
    equal shares, sized by the scarce stratum, with zero upsampling."""
    from mcyj_datapipeline_spark.operators.sampling import mixture_resample

    rows = [(i, "big" if i < 800 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = mixture_resample(df, "lang", "doc_id", {"big": 0.5, "small": 0.5})
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # n_out = min(800/.5, 200/.5) = 400 -> ~200 per stratum.
    assert counts["small"] == 200          # rate 1.0: all kept
    assert abs(counts["big"] - 200) < 40   # hash-sampled ~25% of 800
    # Deterministic: same input -> same rows.
    again = mixture_resample(df, "lang", "doc_id", {"big": 0.5, "small": 0.5})
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_incremental_minhash_finds_cross_side_dup_only(corpus):
    """Screening a 'new batch' against the existing corpus must find
    near-dups that cross the boundary and must NOT report pairs inside
    either side (those were screened at their own ingest)."""
    new = corpus.filter(F.col("doc_id") >= 100)   # docs 100, 101
    old = corpus.filter(F.col("doc_id") < 100)    # docs 0..39
    pairs = {
        (r["new_id"], r["existing_id"]): r["jaccard"]
        for r in D.minhash_lsh_pairs_incremental(
            new, old, jaccard_threshold=0.5
        ).collect()
    }
    assert pairs[(100, 0)] == 1.0          # exact copy of doc 0
    assert 0.8 <= pairs[(101, 1)] < 1.0    # near dup of doc 1
    assert set(pairs) == {(100, 0), (101, 1)}


def test_chunk_level_catches_contained_passage(spark):
    """The containment problem: a 30-token passage lifted into an
    otherwise-unrelated 150-token document keeps whole-doc Jaccard low
    (< 0.2), so document-level MinHash at 0.8 misses it — chunk-level
    detection must surface the pair via the copied window."""
    rng = __import__("random").Random(7)
    vocab = [f"w{i}" for i in range(800)]

    def words(n):
        return [vocab[rng.randrange(len(vocab))] for _ in range(n)]

    passage = words(30)
    doc_a = words(60) + passage + words(60)
    doc_b = words(60) + passage + words(60)  # different surroundings
    df = spark.createDataFrame(
        [(1, " ".join(doc_a)), (2, " ".join(doc_b)), (3, " ".join(words(150)))],
        ["doc_id", "text"],
    )
    doc_level = D.minhash_lsh_pairs(df, jaccard_threshold=0.8).collect()
    assert doc_level == []  # whole-doc similarity too low

    chunk_level = D.chunk_near_dup_pairs(
        df, chunk_size=30, stride=30, jaccard_threshold=0.8
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in chunk_level}
    assert (1, 2) in got
    assert all(p == (1, 2) for p in got)  # doc 3 never implicated


def test_word_shingles_short_text_safe(spark):
    """Texts shorter than the shingle width must yield empty arrays,
    not a slice(start=0) stage failure (sequence(1,0) descends)."""
    df = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, "exactly three words")], ["i", "t"]
    )
    rows = {r["i"]: r["s"] for r in df.select(
        "i", D.word_shingles(F.col("t"), 3).alias("s")).collect()}
    assert rows[1] == [] and rows[2] == []
    assert rows[3] == ["exactly three words"]


def test_containment_catches_subset_jaccard_misses(spark):
    """doc B = doc A's first 12 tokens verbatim. Containment is 1.0;
    Jaccard is ~12/60 and must NOT fire at 0.8."""
    rng = __import__("random").Random(13)
    a_words = [f"c{rng.randrange(900)}" for _ in range(60)]
    df = spark.createDataFrame(
        [(1, " ".join(a_words)), (2, " ".join(a_words[:12]))],
        ["doc_id", "text"],
    )
    jac = D.ngram_jaccard_pairs(df, threshold=0.8).collect()
    assert jac == []
    cont = D.ngram_jaccard_pairs(df, threshold=0.8, metric="containment").collect()
    assert len(cont) == 1
    assert (cont[0]["id_a"], cont[0]["id_b"]) == (1, 2)
    assert cont[0]["containment"] == 1.0


def test_int8_topk_recall_vs_float_baseline(spark, sf_dir):
    """Quantized-corpus search must agree with the float baseline on
    >= 90% of top-5 neighbors (int8 error bound is ~1/255 per dim).
    The registered query now computes this recall contract IN-PLAN
    (round-5 oracle upgrade); assert both the contract row and, at the
    operator level, that the quantized search still returns full
    per-query lists."""
    from mcyj_datapipeline_spark import registry
    from mcyj_datapipeline_spark.io import read_table
    from mcyj_datapipeline_spark.operators.similarity import (
        cosine_topk,
        dequantize_int8,
        quantize_int8,
    )

    row = (
        registry.queries()["sim_cosine_topk_int8"](spark, sf_dir)
        .collect()[0]
    )
    assert row["recall_ok"], row
    assert row["n_queries"] == 8
    assert row["n_pairs_exact"] == 40

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    corpus = emb.select(
        "vec_id",
        dequantize_int8(quantize_int8(F.col("e"))).alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        "vec_id", F.col("e").alias("embedding")
    )
    quant = cosine_topk(corpus, queries, k=5).collect()
    per_query = {}
    for r in quant:
        per_query.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert len(per_query) == 8
    assert all(len(v) == 5 for v in per_query.values())


def test_pq_adc_topk_recall_floor(spark, sf_dir):
    """Pure ADC scan (no refinement) must recover >= 60% of the exact
    top-5 — uniform-random embeddings are PQ's worst case (no cluster
    structure for the codebooks to exploit), so this floor is loose."""
    from mcyj_datapipeline_spark import registry
    from mcyj_datapipeline_spark.io import read_table
    from mcyj_datapipeline_spark.operators import similarity as S

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    base = registry.queries()["sim_cosine_topk_bruteforce"](spark, sf_dir)
    b = {(r["query_id"], r["neighbor_id"]) for r in base.collect()}
    adc = S.pq_topk(emb, q, k=5, m=16, rerank=0)
    p = {(r["query_id"], r["neighbor_id"]) for r in adc.collect()}
    assert len(p) == len(b)
    recall = len(b & p) / len(b)
    assert recall >= 0.6, recall


def test_pq_rerank_matches_exact_baseline(spark, sf_dir):
    """ADC shortlist + exact re-rank must agree with brute force on
    >= 90% of neighbors (measured 100% at both gate scales — the
    registry entry carries the full value oracle on that basis)."""
    from mcyj_datapipeline_spark import registry
    from mcyj_datapipeline_spark.io import read_table
    from mcyj_datapipeline_spark.operators import similarity as S

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    base = registry.queries()["sim_cosine_topk_bruteforce"](spark, sf_dir)
    b = {(r["query_id"], r["neighbor_id"]) for r in base.collect()}
    pq = S.pq_topk(emb, q, k=5, m=16, rerank=4)
    p = {(r["query_id"], r["neighbor_id"]) for r in pq.collect()}
    recall = len(b & p) / len(b)
    assert recall >= 0.9, recall


def test_pq_encode_payload_is_m_bytes(spark, sf_dir):
    """The encoded corpus is the real PQ payload: one binary cell of
    exactly m bytes per vector (not an int array) — the 16x/32x storage
    and shuffle compression the operator exists for."""
    from mcyj_datapipeline_spark.io import read_table
    from mcyj_datapipeline_spark.operators import similarity as S

    emb = read_table(spark, sf_dir, "embeddings").limit(50)
    books = S.pq_train_codebooks(emb, m=8, n_codes=16, sample_n=64)
    assert len(books) == 8 and len(books[0][0]) == 8  # m x (k x dsub)
    enc = S.pq_encode(emb, books)
    assert dict(enc.dtypes)["pq_codes"] == "binary"
    rows = enc.collect()
    assert len(rows) == 50
    assert all(len(r["pq_codes"]) == 8 for r in rows)
    # Deterministic: same corpus -> same books -> same codes.
    books2 = S.pq_train_codebooks(emb, m=8, n_codes=16, sample_n=64)
    assert books == books2


@pytest.mark.parametrize(
    "shape,n,diameter",
    [
        ("chain", 64, 63),
        ("chain", 17, 16),
        ("star", 40, 2),
        ("blob", 30, 1),
        ("two_chains", 24, 11),
    ],
)
def test_cc_round_bound_property(spark, shape, n, diameter):
    """Pointer-jump guarantee, locked in as a property: on a graph of
    diameter D, connected_components must converge within
    jump_after + ceil(log2(D)) + 1 propagation rounds (plus the
    check_every batching slack that can overshoot the fixpoint by at
    most check_every - 1 idempotent rounds), per the docstring's
    doubling argument: one-hop propagation until the valve engages,
    then comp←comp[comp] doubles reach per round."""
    import math

    if shape == "chain":
        pairs = [(i, i + 1) for i in range(n - 1)]
        expect = {i: 0 for i in range(n)}
    elif shape == "star":
        pairs = [(0, i) for i in range(1, n)]
        expect = {i: 0 for i in range(n)}
    elif shape == "blob":  # complete-ish: every node linked to node 0 and 1
        pairs = [(0, i) for i in range(1, n)] + [(1, i) for i in range(2, n)]
        expect = {i: 0 for i in range(n)}
    else:  # two disjoint chains
        half = n // 2
        pairs = [(i, i + 1) for i in range(half - 1)] + [
            (100 + i, 100 + i + 1) for i in range(half - 1)
        ]
        expect = {i: 0 for i in range(half)}
        expect.update({100 + i: 100 for i in range(half)})
    edges = spark.createDataFrame(pairs, ["id_a", "id_b"])
    jump_after, check_every = 4, 2
    stats = {}
    out = D.connected_components(
        edges,
        max_iters=40,
        jump_after=jump_after,
        check_every=check_every,
        _stats=stats,
    )
    comps = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert comps == expect
    bound = jump_after + math.ceil(math.log2(max(diameter, 2))) + 1
    assert stats["rounds"] <= bound + (check_every - 1), (
        f"{shape}(n={n}, D={diameter}): {stats['rounds']} rounds "
        f"exceeds bound {bound}+{check_every - 1}"
    )
    # driver syncs must be ~rounds/check_every, the whole point of
    # batched convergence checks
    assert stats["syncs"] <= stats["rounds"] // check_every + 1


def test_repeated_ngram_spans_exact_boundaries_and_merge(spark):
    """Two docs share an 8-word passage embedded at different offsets:
    with n=4 the duplicated positional grams must merge into ONE span
    per doc covering exactly the shared words; a doc sharing nothing
    yields no rows; and two shared passages separated by more than n
    unique words stay separate spans."""
    from mcyj_datapipeline_spark.operators.dedup import (
        repeated_ngram_spans,
    )

    shared = "the quick brown fox jumps over lazy dogs"  # 8 words
    shared2 = "pack my box with five dozen liquor jugs"  # 8 words
    docs = spark.createDataFrame(
        [
            # shared passage at words 3..10, shared2 at words 20..27
            (
                1,
                "u1 u2 "
                + shared
                + " f1 f2 f3 f4 f5 f6 f7 f8 f9 "
                + shared2
                + " tail1",
            ),
            # same passages at other offsets
            (2, shared + " mid1 mid2 mid3 mid4 mid5 " + shared2),
            (3, "entirely distinct words without any overlap here"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["span_start"]): (r["span_end"], r["n_dup_grams"])
        for r in repeated_ngram_spans(docs, n=4).collect()
    }
    # doc 1: shared at 1-based words 3..10 -> grams at 3..7 -> span
    # (3, 10); shared2 at words 20..27 -> grams 20..24 -> span (20, 27)
    assert out[(1, 3)] == (10, 5)
    assert out[(1, 20)] == (27, 5)
    # doc 2: shared at 1..8 (grams 1..5), shared2 at 14..21 (grams
    # 14..18); gap 14-5=9 > n=4 keeps them separate
    assert out[(2, 1)] == (8, 5)
    assert out[(2, 14)] == (21, 5)
    assert not any(d == 3 for d, _ in out)
    assert len(out) == 4


def test_repeated_ngram_spans_adjacent_passages_merge(spark):
    """Duplicated grams whose word ranges touch (gap <= n) fuse into a
    single span — the merge rule that turns overlapping gram hits into
    maximal ranges."""
    from mcyj_datapipeline_spark.operators.dedup import (
        repeated_ngram_spans,
    )

    a = "alpha beta gamma delta"
    b = "epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, a + " " + b),  # passages adjacent: dup grams at 1, 5
            (2, a + " y1 y2 y3 y4 y5 " + b),  # gap 10-1 > n: separate
            (3, a), (4, b),
        ],
        "doc_id long, text string",
    )
    rows = repeated_ngram_spans(docs, n=4).collect()
    spans = {}
    for r in rows:
        spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_dup_grams"])
        )
    # doc 1 words: a(1..4) b(5..8). The grams bridging the boundary
    # exist only in doc 1, so the dup gram positions are 1 (from doc 3)
    # and 5 (from doc 4); 5 - 1 = 4 <= n = 4 fuses them into ONE span
    # covering both passages.
    assert spans[1] == [(1, 8, 2)]
    # doc 2 words: a(1..4) fillers(5..9) b(10..13): 10 - 1 = 9 > n
    assert sorted(spans[2]) == [(1, 4, 1), (10, 13, 1)]
    assert spans[3] == [(1, 4, 1)]
    assert spans[4] == [(1, 4, 1)]


def test_cut_repeated_ngram_spans_owner_keeps_others_lose(spark):
    """Span-cut rewrite: the gram's minimum doc keeps its occurrence
    verbatim; every other doc loses exactly the covered words; unique
    docs pass through; word counts reconcile."""
    from mcyj_datapipeline_spark.operators.dedup import (
        cut_repeated_ngram_spans,
    )

    shared = "one two three four"  # a single 4-gram
    docs = spark.createDataFrame(
        [
            (1, "pre " + shared + " post"),      # owner (min doc id)
            (2, "alpha " + shared + " omega"),   # loses the 4 words
            (3, shared),                          # loses everything
            (4, "totally unrelated words here"),  # untouched
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (
            r["n_words_before"],
            r["n_words_after"],
            r["clean_text"],
        )
        for r in cut_repeated_ngram_spans(docs, n=4).collect()
    }
    assert out[1] == (6, 6, "pre " + shared + " post")
    assert out[2] == (6, 2, "alpha omega")
    assert out[3] == (4, 0, "")
    assert out[4] == (4, 4, "totally unrelated words here")


def test_repeated_ngram_spans_random_corpora_match_bruteforce(spark):
    """Randomized cross-check (the union-find pattern): on arbitrary
    small corpora drawn from a tiny vocabulary (to force shared
    grams), the Spark span pipeline must agree exactly with a
    driver-side brute-force reference over three seeds."""
    from mcyj_datapipeline_spark.operators.dedup import (
        repeated_ngram_spans,
    )

    def brute(docs, n):
        grams = {}
        for did, text in docs:
            ws = text.split()
            for p in range(1, len(ws) - n + 2):
                g = " ".join(ws[p - 1 : p - 1 + n])
                grams.setdefault(g, set()).add(did)
        dup = {g for g, ds in grams.items() if len(ds) >= 2}
        out = []
        for did, text in docs:
            ws = text.split()
            hits = [
                p
                for p in range(1, len(ws) - n + 2)
                if " ".join(ws[p - 1 : p - 1 + n]) in dup
            ]
            span = None
            for p in hits:
                if span and p - span[1] <= n:
                    span = (span[0], p, span[2] + 1)
                else:
                    if span:
                        out.append((did, span[0], span[1] + n - 1, span[2]))
                    span = (p, p, 1)
            if span:
                out.append((did, span[0], span[1] + n - 1, span[2]))
        return sorted(out)

    for seed, n_docs, vocab_n, doc_len, n in [
        (11, 12, 6, 18, 3),
        (12, 8, 4, 25, 4),
        (13, 15, 8, 12, 2),
    ]:
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(vocab_n)]
        docs = [
            (
                i,
                " ".join(
                    vocab[rng.randrange(vocab_n)] for _ in range(doc_len)
                ),
            )
            for i in range(n_docs)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = sorted(
            (
                r["doc_id"],
                r["span_start"],
                r["span_end"],
                r["n_dup_grams"],
            )
            for r in repeated_ngram_spans(df, n=n).collect()
        )
        assert got == brute(docs, n), f"seed {seed} diverged"


def test_prefix_filter_jaccard_equals_bruteforce_with_fewer_candidates(
    corpus,
):
    """Prefix filtering is exact by theorem: on the crafted corpus its
    pair set must EQUAL ngram_jaccard_pairs'. And it must earn its
    keep — the prefix inverted index generates strictly fewer
    candidate pairs than the full shared-shingle index."""
    exact = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in D.ngram_jaccard_pairs(corpus, threshold=0.5).collect()
    }
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in D.prefix_filter_jaccard_pairs(
            corpus, threshold=0.5
        ).collect()
    }
    assert got == exact and exact, got ^ exact


def test_minhash_signatures_hash_expression_evaluates_once(spark):
    """r10 regression pin: naming the shingle-hash array in its own
    projection before the explode turns the generator child into an
    attribute, which lets InferFiltersFromGenerate add a size()>0
    filter that constraint propagation pushes below the repartition —
    re-evaluating the whole shingle+hash subtree a second time
    pre-shuffle (measured 4.4x on minhash_signatures, rippling into
    every LSH-spine bench query). The hash60 subtree must appear
    exactly once in the optimized plan.

    Coupling note: the anchor is the repo-owned
    :func:`hashing.count_hash60_in_plan` marker (the
    conv(substring(md5(...))) construction), NOT a bare ``md5`` token
    count — so a hash60 implementation change updates the marker in
    the same commit, and unrelated md5 uses or Catalyst rendering
    drift can't fail this spuriously."""
    from mcyj_datapipeline_spark.operators.hashing import (
        count_hash60_in_plan,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], ["doc_id", "text"]
    )
    plan = (
        D.minhash_signatures(df)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert count_hash60_in_plan(plan) == 1, plan


@pytest.mark.heavytier
def test_prefix_filter_filters_never_drop_true_pairs(spark):
    """The r10 length/positional prunes are exact by theorem — fuzz
    it: random near-dup-rich corpora at thresholds that exercise the
    ``ceil`` edges of both the prefix length and the required-overlap
    bound (alpha) must produce EXACTLY the brute-force pair set, for
    the string path and the opt-in hash path alike."""
    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(120)]
    for seed in range(3):
        rng.seed(seed)
        rows = []
        base = [rng.choice(vocab) for _ in range(24)]
        for i in range(40):
            words = list(base)
            # mutate a seed-dependent number of positions so pair
            # similarities spread across every threshold bucket
            for _ in range(rng.randrange(0, 20)):
                words[rng.randrange(len(words))] = rng.choice(vocab)
            rng.shuffle(words)
            rows.append((i, " ".join(words)))
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        for t in (0.3, 0.5, 0.75):
            brute = {
                (r["id_a"], r["id_b"], r["jaccard"])
                for r in D.ngram_jaccard_pairs(df, threshold=t).collect()
            }
            for hk in (False, True):
                got = {
                    (r["id_a"], r["id_b"], r["jaccard"])
                    for r in D.prefix_filter_jaccard_pairs(
                        df, threshold=t, hash_keys=hk
                    ).collect()
                }
                assert got == brute, (
                    f"seed={seed} t={t} hash_keys={hk}: "
                    f"{got ^ brute}"
                )


def test_prefix_filter_skips_boilerplate_candidate_blowup(spark):
    """The scale claim: a boilerplate header shared by every doc makes
    the FULL inverted index generate all C(n,2) candidate pairs, while
    the prefix index (rarest-first order pushes the high-df header
    shingles into suffixes) generates none of them — same final pair
    set (empty here: bodies are unique), quadratically fewer
    candidates."""
    header = "standard license header all rights reserved"
    rng = random.Random(5)
    vocab = [f"b{i}" for i in range(2000)]
    corpus = spark.createDataFrame(
        [
            (
                i,
                header
                + " "
                + " ".join(
                    vocab[rng.randrange(len(vocab))] for _ in range(30)
                ),
            )
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    # same final answer (no pair reaches jaccard 0.5)
    assert D.prefix_filter_jaccard_pairs(corpus, threshold=0.5).count() == 0
    assert D.ngram_jaccard_pairs(corpus, threshold=0.5).count() == 0

    # candidate-count comparison on the same shingle sets
    sh = corpus.select(
        "doc_id", D.word_shingles(F.col("text"), 3).alias("sh")
    ).filter(F.size("sh") > 0)
    inv = sh.select("doc_id", F.explode("sh").alias("shingle"))
    full_cands = (
        inv.alias("x")
        .join(inv.alias("y"), "shingle")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select("x.doc_id", "y.doc_id")
        .distinct()
        .count()
    )
    freq = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    ordered = (
        inv.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("_df", "shingle"))).alias(
                "_ord"
            )
        )
    )
    plen = (
        F.size("_ord") - F.ceil(F.lit(0.5) * F.size("_ord")) + 1
    ).cast("int")
    pref = ordered.select(
        "doc_id",
        F.explode(
            F.transform(F.slice("_ord", 1, plen), lambda s: s["shingle"])
        ).alias("shingle"),
    )
    pref_cands = (
        pref.alias("x")
        .join(pref.alias("y"), "shingle")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select("x.doc_id", "y.doc_id")
        .distinct()
        .count()
    )
    assert full_cands >= 190  # every C(20,2) pair via the header
    assert pref_cands < full_cands // 10, (pref_cands, full_cands)


def test_repeated_ngram_spans_hash_first_identical_output(spark, sf_dir):
    """The 100 TB shuffle shape (xxhash64 gram keys + exact string
    confirm on the candidate subset) must produce EXACTLY the plain
    path's spans — collisions can never promote a unique gram."""
    from mcyj_datapipeline_spark.io import read_table
    from mcyj_datapipeline_spark.operators.dedup import (
        repeated_ngram_spans,
    )

    docs = read_table(spark, sf_dir, "documents")
    plain = sorted(
        tuple(r) for r in repeated_ngram_spans(docs, n=5).collect()
    )
    hashed = sorted(
        tuple(r)
        for r in repeated_ngram_spans(docs, n=5, hash_first=True).collect()
    )
    assert plain == hashed and plain


def test_cut_repeated_ngram_spans_null_text_pins_zero(spark):
    """NULL text must keep the oracle's (0, 0, '') contract — before
    the ADVICE-r8 fix, size(null) leaked NULL into both word counts."""
    from mcyj_datapipeline_spark.operators.dedup import (
        cut_repeated_ngram_spans,
    )

    shared = "one two three four"
    docs = spark.createDataFrame(
        [(1, shared + " tail"), (2, "head " + shared), (3, None)],
        "doc_id long, text string",
    )
    for hf in (True, False):
        out = {
            r["doc_id"]: (
                r["n_words_before"],
                r["n_words_after"],
                r["clean_text"],
            )
            for r in cut_repeated_ngram_spans(
                docs, n=4, hash_first=hf
            ).collect()
        }
        assert out[3] == (0, 0, "")
        assert out[1] == (5, 5, shared + " tail")
        assert out[2] == (5, 1, "head")
