"""Similarity-search and text-sketch operators not covered by the
SQL oracle gate (LSH top-k, embedding near-dup, rolling-hash sketch)."""

import pytest
from pyspark.sql import functions as F

from marshmallow_spark.operators.dedup import embedding_near_duplicates
from marshmallow_spark.operators.similarity import (
    cosine_topk,
    hyperplane_buckets,
    lsh_topk,
)
from marshmallow_spark.operators.text import rolling_hash_fingerprints


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)


def test_lsh_topk_consistent_with_exact(spark, emb):
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in cosine_topk(emb, "vec_id", "embedding", k=5).collect()
    }
    approx = lsh_topk(emb, "vec_id", "embedding", k=5, num_planes=6, dim=64).collect()
    assert len(approx) > 0
    # every approx pair's cosine must equal the exact computation
    approx_cos = {(r.query_id, r.neighbor_id): r.cosine for r in approx}
    overlap = set(approx_cos) & set(exact)
    assert overlap, "LSH found none of the true top-5 pairs"
    for pair in overlap:
        assert abs(approx_cos[pair] - exact[pair]) < 1e-9


def test_hyperplane_buckets_deterministic(spark, emb):
    b1 = {r.vec_id: r.bucket for r in hyperplane_buckets(emb, "vec_id", "embedding", num_planes=6, dim=64).collect()}
    b2 = {r.vec_id: r.bucket for r in hyperplane_buckets(emb, "vec_id", "embedding", num_planes=6, dim=64).collect()}
    assert b1 == b2
    assert all(0 <= v < 64 for v in b1.values())


def test_embedding_near_duplicates_finds_planted_pair(spark):
    base = [1.0] + [0.0] * 7
    near = [0.999] + [0.02] + [0.0] * 6
    ortho = [0.0] * 7 + [1.0]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, ortho)], "id int, embedding array<float>"
    )
    pairs = {(r.a, r.b) for r in embedding_near_duplicates(df, "id", "embedding", min_cosine=0.95).collect()}
    assert pairs == {(1, 2)}


def test_connected_components_clusters(spark):
    from marshmallow_spark.operators.dedup import connected_components

    # two chains + an isolated pair: {1,2,3,4}, {7,8}, {10,11}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 8), (11, 10)], "a long, b long"
    )
    comp = {r.id: r.comp for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 8: 7, 10: 10, 11: 10}


def test_rolling_hash_containment(spark):
    shared = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [
            ("a", shared),
            ("b", "PREFIX >> " + shared + " << SUFFIX"),
            ("c", "completely different content with no overlap whatsoever!"),
        ],
        "id string, text string",
    )
    rows = {r.id: set(r.hashes) for r in rolling_hash_fingerprints(df, "id", "text").collect()}
    jac_ab = len(rows["a"] & rows["b"]) / len(rows["a"] | rows["b"])
    jac_ac = len(rows["a"] & rows["c"]) / len(rows["a"] | rows["c"])
    assert jac_ab > 0.2       # containment visible through the sketch
    assert jac_ac < 0.05      # unrelated docs share ~nothing


# --- round-2 scale-fix regressions ------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_ngram_jaccard_candidates_path_matches_no_candidates(spark):
    from marshmallow_spark.operators import dedup

    # "xxth" family shares the stop-shingle-ish grams; two near-dup pairs
    df = _docs(spark, [
        ("d1", "the cat sat on the mat"),
        ("d2", "the cat sat on the hat"),
        ("d3", "a completely different sentence"),
        ("d4", "the cat sat on the mat"),
    ])
    full = dedup.ngram_jaccard_pairs(df, "doc_id", "text", min_jaccard=0.5)
    want = {tuple(r) for r in full.collect()}
    cand = spark.createDataFrame(
        [("d1", "d2"), ("d1", "d4"), ("d2", "d4"), ("d1", "d3")], "a string, b string"
    )
    got = {
        tuple(r)
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", candidates=cand, min_jaccard=0.5
        ).collect()
    }
    # candidate path returns the subset of `want` within the pair list
    assert got == {r for r in want if (r[0], r[1]) in
                   {("d1", "d2"), ("d1", "d4"), ("d2", "d4"), ("d1", "d3")}}
    assert ("d1", "d4") in {(a, b) for a, b, *_ in got}


def test_ngram_jaccard_stop_shingle_df_cap(spark):
    from marshmallow_spark.operators import dedup

    # every doc shares " th" — with a df cap of 3 the ubiquitous shingles
    # drop out and only genuinely-similar pairs survive
    rows = [(f"d{i}", f"the {i} the thing the") for i in range(6)]
    rows += [("x1", "zebra quagga okapi"), ("x2", "zebra quagga okapi")]
    df = _docs(spark, rows)
    capped = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", min_jaccard=0.9, max_doc_freq=3
    )
    got = {(r["a"], r["b"]) for r in capped.collect()}
    assert ("x1", "x2") in got


def test_lsh_candidate_pairs_salted_equals_unsalted(spark):
    from marshmallow_spark.operators import dedup

    # planted degenerate band: 30 empty-ish docs share the same signature
    rows = [(f"e{i:02d}", 7, 7) for i in range(30)]
    rows += [("a1", 1, 2), ("a2", 1, 2), ("b1", 3, 4)]
    sigs = spark.createDataFrame(rows, "doc_id string, h0 int, h1 int")
    plain = {
        tuple(r)
        for r in dedup.lsh_candidate_pairs(sigs, "doc_id", ["h0", "h1"]).collect()
    }
    salted = {
        tuple(r)
        for r in dedup.lsh_candidate_pairs(
            sigs, "doc_id", ["h0", "h1"], salt_threshold=10, num_salts=4
        ).collect()
    }
    assert salted == plain
    assert ("a1", "a2") in salted
    assert len([p for p in salted if p[0].startswith("e")]) == 30 * 29 // 2


def test_simhash_single_hash_pass_plan(spark):
    from marshmallow_spark.operators import dedup

    df = _docs(spark, [("d1", "alpha beta gamma"), ("d2", "alpha beta delta")])
    sim = dedup.simhash(df, "doc_id", "text", bits=32)
    plan = sim._jdf.queryExecution().optimizedPlan().toString()
    # the hashed-token transform must appear exactly once per row, not 32x
    assert plan.count("md5") == 1, f"md5 appears {plan.count('md5')}x in plan"
    vals = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    assert 0 <= vals["d1"] < (1 << 32) and 0 <= vals["d2"] < (1 << 32)


def test_connected_components_star_matches_label_prop(spark):
    """Large-star/small-star CC (giant-component-safe) agrees with label
    propagation and a driver-side union-find on assorted graph shapes."""
    import random

    from marshmallow_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    edges = []
    # chain 0..9, clique 100..104, star 200<-201..230, random pairs
    edges += [(f"n{i}", f"n{i+1}") for i in range(9)]
    edges += [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    edges += [("s200", f"s{200+i}") for i in range(1, 31)]
    edges += [(f"r{rng.randrange(40)}", f"r{rng.randrange(40)}") for _ in range(30)]
    edges = [(a, b) for a, b in edges if a != b]

    # driver-side union-find oracle
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    for a, b in edges:
        union(a, b)
    want = {x: find(x) for x in parent}
    # canonicalize: min member per component
    comp_min = {}
    for x, r in want.items():
        comp_min.setdefault(r, x)
        comp_min[r] = min(comp_min[r], x)
    want = {x: comp_min[find(x)] for x in parent}

    df = spark.createDataFrame(edges, "a string, b string")
    star = {r.id: r.comp for r in connected_components_star(df).collect()}
    prop = {r.id: r.comp for r in connected_components(df).collect()}
    assert star == want
    assert prop == want
