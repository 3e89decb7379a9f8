"""Behavioral gates for the approximate (rows-only) operators:
LSH candidates must be a subset of exact results, with full recall on the
high-similarity regime they are tuned for."""

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_minhash_subset_and_high_sim_recall(spark, docs):
    from butterfly_osm_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = {(r.doc_a, r.doc_b, r.jaccard) for r in ngram_jaccard_pairs(docs, 0.5).collect()}
    approx = {(r.doc_a, r.doc_b, r.jaccard) for r in minhash_lsh_pairs(docs, 0.5).collect()}
    assert approx <= exact, "LSH output must be exact-verified (subset of truth)"
    high = {t for t in exact if t[2] >= 0.9}
    found_high = {t for t in approx if t[2] >= 0.9}
    assert found_high == high, "b=8,r=8 banding must have ~certain recall at j>=0.9"
    assert len(high) > 0, "fixture should contain seeded near-dups"


def test_simhash_catches_exact_dups(spark, docs):
    from butterfly_osm_spark.operators.dedup import simhash_pairs

    import pyspark.sql.functions as F

    # identical texts => identical simhash => hamming 0
    dup = docs.limit(1).select(F.lit(999999).alias("doc_id"), "text", "lang", "source", "n_chars")
    with_dup = docs.unionByName(dup)
    pairs = simhash_pairs(with_dup).collect()
    orig = docs.limit(1).collect()[0].doc_id
    assert any(r.doc_a == min(orig, 999999) and r.doc_b == max(orig, 999999) and r.hamming == 0 for r in pairs)


def test_ann_lsh_subset_and_recall(spark, embs):
    from butterfly_osm_spark.operators.ann import (
        cosine_topk_bruteforce,
        cosine_topk_lsh,
        lsh_candidates,
    )

    n = embs.count()
    brute = cosine_topk_bruteforce(embs, k=1).collect()
    approx = cosine_topk_lsh(embs, k=1).collect()
    true_top = {r.vec_id: r.neighbor_id for r in brute}
    got_top = {r.vec_id: r.neighbor_id for r in approx}
    hit = sum(1 for v, nb in got_top.items() if true_top.get(v) == nb)
    recall = hit / len(true_top)
    # near-orthogonal 64-d embeddings are the worst case for hyperplane
    # LSH; the gate pins the default (16 bands x 8 bits) config's floor
    assert recall >= 0.25, f"rank-1 recall {recall:.3f} below floor"
    # the candidate set must be measurably sub-quadratic, not a disguised
    # cross join (round-1 defect: 4-bit bands -> 16 buckets -> ~O(n^2))
    n_cand = lsh_candidates(embs).count()  # both directions counted
    assert n_cand <= 0.25 * n * (n - 1), f"candidates {n_cand} not << n^2"
    # every returned neighbor must carry its exact (re-ranked) cosine
    brute_cos = {(r.vec_id, r.neighbor_id): r.cos for r in cosine_topk_bruteforce(embs, k=5).collect()}
    for r in approx:
        if (r.vec_id, r.neighbor_id) in brute_cos:
            assert brute_cos[(r.vec_id, r.neighbor_id)] == r.cos


def test_ann_lsh_scale_preset_high_sim_recall(spark):
    """The web-scale preset (8 bands x 16 bits = 65 536 buckets/band) is
    tuned for the high-similarity near-dup regime: on seeded clusters of
    cos >= 0.95 duplicates it must reach full recall while touching a
    vanishing fraction of the n^2 pair space."""
    import numpy as np
    import pandas as pd

    from butterfly_osm_spark.operators.ann import (
        LSH_SCALE_BANDS,
        LSH_SCALE_BITS,
        lsh_candidates,
    )

    rng = np.random.default_rng(7)
    base = rng.standard_normal((300, 64))
    rows = []
    vid = 0
    true_pairs = set()
    for i in range(300):
        rows.append((vid, base[i].astype(np.float32).tolist()))
        anchor = vid
        vid += 1
        if i % 5 == 0:  # seed a near-duplicate: tiny perturbation
            v = base[i] + 0.03 * rng.standard_normal(64)
            rows.append((vid, v.astype(np.float32).tolist()))
            cos = float(base[i] @ v / (np.linalg.norm(base[i]) * np.linalg.norm(v)))
            if cos >= 0.95:
                true_pairs.add((anchor, vid))
            vid += 1
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    cand = {
        (min(r.vec_id, r.neighbor_id), max(r.vec_id, r.neighbor_id))
        for r in lsh_candidates(df, n_bands=LSH_SCALE_BANDS, bits=LSH_SCALE_BITS).collect()
    }
    assert true_pairs, "seeding produced no cos>=0.95 pairs"
    missed = true_pairs - cand
    assert not missed, f"scale preset missed {len(missed)}/{len(true_pairs)} near-dup pairs"
    n = vid
    assert len(cand) <= 0.02 * n * (n - 1) / 2, f"{len(cand)} candidates not sub-quadratic"


def test_ann_ivf_subset_and_recall(spark, embs):
    """IVF (coarse quantizer + n_probe cells + exact re-rank): returned
    neighbors must carry exact re-ranked cosines, candidate volume must be
    the inverted-file fraction (~n_probe/C of all pairs), and rank-1
    recall must clear the floor for the label-clustered quantizer."""
    from butterfly_osm_spark.operators.ann import ann_cosine_ivf, cosine_topk_bruteforce

    n = embs.count()
    brute = {r.vec_id: r.neighbor_id for r in cosine_topk_bruteforce(embs, k=1).collect()}
    got = ann_cosine_ivf(embs, k=1).collect()
    ivf = {r.vec_id: r.neighbor_id for r in got}
    recall = sum(1 for v, nb in ivf.items() if brute.get(v) == nb) / len(brute)
    assert recall >= 0.5, f"IVF rank-1 recall {recall:.3f} below floor"
    brute_cos = {
        (r.vec_id, r.neighbor_id): r.cos for r in cosine_topk_bruteforce(embs, k=5).collect()
    }
    for r in got:
        if (r.vec_id, r.neighbor_id) in brute_cos:
            assert brute_cos[(r.vec_id, r.neighbor_id)] == r.cos


def test_embedding_neardup_lsh_full_recall_and_subquadratic(spark, fix001):
    """The banded LSH near-dup must (a) exactly reproduce the thresholded
    pair set on the frozen fixture+planes (recall gate) and (b) verify far
    fewer candidate pairs than the quadratic kernel would."""
    import duckdb

    from butterfly_osm_spark.operators.ann import (
        embedding_neardup_lsh,
        embedding_neardup_oracle_sql,
        lsh_candidates,
    )

    emb = spark.read.parquet(fix001 + "/embeddings_nd.parquet")
    n = emb.count()
    got = sorted(
        (r.vec_id, r.neighbor_id, r.cos)
        for r in embedding_neardup_lsh(emb, tau=0.9).collect()
    )
    want = sorted(
        map(
            tuple,
            duckdb.sql(
                embedding_neardup_oracle_sql(
                    0.9, src=f"read_parquet('{fix001}/embeddings_nd.parquet')"
                )
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 0
    n_cand = lsh_candidates(emb).where("vec_id < neighbor_id").count()
    assert n_cand < n * (n - 1) / 2 / 10, (
        f"candidate set {n_cand} not sub-quadratic vs {n*(n-1)//2} pairs"
    )


def test_multiprobe_lifts_mid_cosine_recall(spark):
    """On the driver's near-orthogonal embeddings (qualifying pairs at
    cos 0.35-0.48 — the regime plain banding does NOT target), probing the
    2-flip bucket neighborhood must lift pair recall from partial to
    ~complete while leaving the corpus side of the join untouched."""
    import duckdb

    from butterfly_osm_spark.operators.ann import (
        embedding_neardup_oracle_sql,
        lsh_candidates,
    )

    src = "/root/testdata/sf0.001/embeddings.parquet"
    emb = spark.read.parquet(src)
    duckdb.sql(f"CREATE OR REPLACE VIEW embeddings AS SELECT * FROM '{src}'")
    want = {
        (a, b)
        for a, b, _ in duckdb.sql(embedding_neardup_oracle_sql(0.35)).fetchall()
    }
    assert len(want) > 50

    def recall(probe_bits: int) -> float:
        got = {
            (r.vec_id, r.neighbor_id)
            for r in lsh_candidates(emb, probe_bits=probe_bits)
            .where("vec_id < neighbor_id")
            .collect()
        }
        return len(got & want) / len(want)

    r0, r2 = recall(0), recall(2)
    assert r0 < 0.7, f"baseline banding unexpectedly strong ({r0}) — test loses power"
    assert r2 > r0 + 0.2
    assert r2 >= 0.95, f"multiprobe recall {r2}"


def test_kmeans_train_and_trained_ivf(spark):
    """Lloyd's objective must be non-decreasing, training deterministic,
    and IVF with the TRAINED codebook must reach comparable top-k recall
    to the label-mean stand-in against the exact kernel."""
    from butterfly_osm_spark.operators.ann import (
        ann_cosine_ivf,
        cosine_topk_bruteforce,
        kmeans_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cent1, obj1 = kmeans_train(emb, k=8, iters=4)
    _, obj2 = kmeans_train(emb, k=8, iters=4)
    assert obj1 == obj2, "training must be deterministic"
    assert all(b >= a - 1e-9 for a, b in zip(obj1, obj1[1:])), f"objective fell: {obj1}"
    assert obj1[-1] > obj1[0], "no improvement over init"

    exact = {
        (r.vec_id, r.neighbor_id) for r in cosine_topk_bruteforce(emb, k=5).collect()
    }

    def recall(df):
        got = {(r.vec_id, r.neighbor_id) for r in df.collect()}
        return len(got & exact) / len(exact)

    r_label = recall(ann_cosine_ivf(emb, k=5))
    r_trained = recall(ann_cosine_ivf(emb, k=5, centroids=cent1))
    assert r_trained >= r_label - 0.05, (r_trained, r_label)
    assert r_trained >= 0.5


def test_kmeans_reproduces_gentime_codebook(spark, fix001):
    """The ivf_codebook fixture is a single-threaded reference run of the
    distributed trainer (same md5 init, 9-dp assignment rounding,
    empty-cluster rule). The distributed kmeans_train must reproduce it —
    this is what makes the driver-facing trained-IVF oracle a check of
    the REAL training path, not a stand-in."""
    import os

    import numpy as np

    from butterfly_osm_spark.operators.ann import kmeans_train

    ref = {
        r.centroid_id: np.array(r.cvec)
        for r in spark.read.parquet(os.path.join(fix001, "ivf_codebook.parquet")).collect()
    }
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cent, obj = kmeans_train(emb, k=8, iters=5)
    got = {r.centroid_id: np.array(r.cvec) for r in cent.collect()}
    assert set(got) == set(ref) == set(range(8))
    for c in ref:
        assert np.allclose(got[c], ref[c], atol=1e-8), f"centroid {c} diverged"
    assert all(b >= a - 1e-9 for a, b in zip(obj, obj[1:]))


def test_connected_components_log_rounds_and_bounded_state(spark):
    """Pointer jumping must converge in O(log diameter) rounds — a
    200-node path graph (diameter 199) must NOT take ~199 min-label
    rounds — and the label table stays exactly |V| rows (per-iteration
    work is one O(|E|) relax + one O(|V|) jump; nothing collected)."""
    from butterfly_osm_spark.operators.dedup import connected_components

    n = 200
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src LONG, dst LONG")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id LONG")
    labels, iters = connected_components(edges, nodes)
    assert iters <= 12, f"path graph took {iters} rounds — doubling is broken"
    rows = labels.collect()
    assert len(rows) == n
    assert all(r.lab == 0 for r in rows)
    labels.unpersist()


def test_dedup_clusters_matches_union_find(spark):
    """Cluster labels == driver-side union-find over the exact pair set
    (tiny corpus only — the distributed path exists precisely so this
    collect-based check never runs at scale)."""
    from butterfly_osm_spark.operators.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_lsh_pairs(docs, 0.5).collect()
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(r.doc_a), find(r.doc_b)
        if a != b:
            parent[max(a, b)] = min(a, b)
    want = {i: find(i) for i in ids}

    got = {r.doc_id: (r.cluster_id, r.is_keeper) for r in dedup_clusters(docs, 0.5).collect()}
    assert set(got) == set(want)
    for i in ids:
        assert got[i][0] == want[i], f"doc {i} labeled {got[i][0]}, want {want[i]}"
        assert got[i][1] == (i == want[i])
    # at least one real multi-doc cluster on this corpus, and keepers are
    # exactly the cluster minima
    n_clusters = len({c for c, _ in got.values()})
    assert n_clusters < len(ids)
    assert sum(k for _, k in got.values()) == n_clusters


def test_contamination_check_planted_and_plan(spark, fix001):
    """Planted benchmark snippets must be flagged against their source
    docs (unmutated ones at overlap_frac 1.0); clean synthetic items must
    produce no rows; and the physical plan must broadcast the benchmark
    side (the corpus never shuffles — that is the 100 TB shape)."""
    import os

    from butterfly_osm_spark.operators.dedup import contamination_check

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = spark.read.parquet(os.path.join(fix001, "benchmarks.parquet"))
    out = contamination_check(docs, bench.select("bench_id", "text"))
    rows = out.collect()
    assert len(rows) > 0

    flagged = {r.bench_id for r in rows}
    planted = {r.bench_id for r in bench.where("planted").collect()}
    clean = {r.bench_id for r in bench.where("NOT planted").collect()}
    assert flagged <= planted, "clean items must never be flagged"
    # unmutated planted items (bench_id % 3 != 2 by generation contract)
    # are verbatim snippets -> full-overlap hit
    exact_expected = {b for b in planted if b % 3 != 2}
    exact_hit = {r.bench_id for r in rows if r.overlap_frac == 1.0}
    assert exact_expected <= exact_hit
    # mutated items sit below the 0.5 gate on these snippet lengths, so
    # the threshold is doing real work (they DO appear at min_frac=0)
    lo = contamination_check(docs, bench.select("bench_id", "text"), min_frac=1e-9)
    assert {r.bench_id for r in lo.collect()} == planted

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, "benchmark side must broadcast"


def test_auto_probe_policy_pins_measured_regimes():
    """The multiprobe default must encode the documented regimes
    (PLANS.md cost/recall table): 0 probes at the 16-bit scale preset at
    any corpus size; 2 at the 8-bit default on a corpus bigger than its
    256 buckets/band; 0 when the bucket space over-provisions the corpus
    (each band chunk already near-unique)."""
    from butterfly_osm_spark.operators.ann import (
        BITS_PER_BAND,
        LSH_SCALE_BITS,
        auto_probe_bits,
    )

    assert auto_probe_bits(10**12, LSH_SCALE_BITS) == 0
    assert auto_probe_bits(500, LSH_SCALE_BITS) == 0
    assert auto_probe_bits(500, BITS_PER_BAND) == 2
    assert auto_probe_bits(2500, BITS_PER_BAND) == 2
    assert auto_probe_bits(100, BITS_PER_BAND) == 0


def test_substring_dedup_planted_span_and_subquadratic(spark):
    """A planted 12-word span shared by two otherwise-distinct docs must
    surface as ONE maximal span row with exact offsets; candidate volume
    stays sub-quadratic (bounded by the hot-window gate)."""
    from butterfly_osm_spark.operators.dedup import SPAN_W, _span_windows, substring_dedup

    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    docs = spark.createDataFrame(
        [
            (1, "one two three " + span + " four five six"),
            (2, span + " seven eight nine ten eleven twelve thirteen"),
            (3, "completely different words with no overlap at all here today"),
        ],
        "doc_id long, text string",
    )
    rows = substring_dedup(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_id, r.dup_of) == (2, 1)
    assert r.span_len == 12
    assert r.span_start == 0  # span opens doc 2
    assert r.src_start == 3  # after "one two three" in doc 1
    # sub-quadratic gate on the real corpus: matched window pairs must be
    # far below the all-pairs window count
    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wn = _span_windows(corpus, SPAN_W)
    n_windows = wn.count()
    from pyspark.sql import functions as F

    pairs = (
        wn.groupBy("gh").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("p"))
        .collect()[0]["p"]
    )
    assert pairs < 0.001 * n_windows * (n_windows - 1) / 2


def test_substring_dedup_merges_adjacent_windows_per_diagonal(spark):
    """Two disjoint shared spans in the same doc pair yield two rows, not
    a merged one; offsets are maximal per diagonal."""
    from butterfly_osm_spark.operators.dedup import substring_dedup

    s1 = "a1 a2 a3 a4 a5 a6 a7 a8"  # exactly one window
    s2 = "b1 b2 b3 b4 b5 b6 b7 b8 b9"  # two windows -> 9-token span
    docs = spark.createDataFrame(
        [
            (10, s1 + " filler1 filler2 " + s2),
            (20, s2 + " mid1 mid2 mid3 " + s1),
        ],
        "doc_id long, text string",
    )
    rows = {(r.span_start, r.span_len, r.src_start) for r in substring_dedup(docs).collect()}
    # doc 20 copies s2 at 0 (src: doc 10 offset 10) and s1 at 12 (src: 0)
    assert rows == {(0, 9, 10), (12, 8, 0)}


def test_incremental_dedup_equals_from_scratch_and_touches_only_affected(spark, docs):
    """Shard-append gate (VERDICT r4 #4): folding the appended shard into
    the retained (band index, labels) state must equal a from-scratch
    dedup_clusters run over the full corpus, while the CC subproblem
    touches only the affected components + the new shard."""
    from butterfly_osm_spark.operators.dedup import (
        dedup_clusters,
        incremental_dedup,
        lsh_band_index,
    )

    base = docs.where("doc_id < 400")
    new = docs.where("doc_id >= 400")
    n_total = docs.count()
    n_new = new.count()
    assert 0 < n_new < n_total

    base_labels = dedup_clusters(base)
    index = lsh_band_index(base)
    stats: dict = {}
    inc = incremental_dedup(index, base_labels, base, new, stats=stats)
    full = dedup_clusters(docs)

    got = {(r.doc_id, r.cluster_id, r.is_keeper) for r in inc.collect()}
    want = {(r.doc_id, r.cluster_id, r.is_keeper) for r in full.collect()}
    assert got == want

    # work proportional to the change: the CC ran on new docs + affected
    # members only, far below the corpus
    assert stats["n_cc_nodes"] < n_total
    assert stats["n_cc_nodes"] >= n_new
    inc.unpersist(); full.unpersist(); base_labels.unpersist()
