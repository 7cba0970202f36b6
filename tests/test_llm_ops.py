"""LLM-pipeline operator tests: dedup recall, similarity correctness,
text analysis, multimodal plumbing.  Oracle parity for the SQL-checkable
queries is covered by test_oracle_parity; these tests assert the
*semantic* properties the oracle can't (LSH recall vs exact, ANN recall
vs brute force, stub plumbing shapes)."""

import pytest
from pyspark.sql import functions as F

from tmp_parquet_merge_spark.operators import (
    curation,
    dedup,
    multimodal,
    similarity,
    text,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_exact_dedup_counts(spark, docs):
    out = dedup.exact_dedup(docs, "text", "doc_id")
    assert out.agg(F.sum("n_dupes")).collect()[0][0] == docs.count()
    # dedup of a corpus duplicated twice halves back to the original
    doubled = docs.unionAll(docs.withColumn("doc_id", F.col("doc_id") + 100000))
    out2 = dedup.exact_dedup(doubled, "text", "doc_id")
    assert out2.count() == out.count()
    assert out2.filter(F.col("n_dupes") < 2).count() == 0


def test_shingle_rows_matches_array_form(spark, docs):
    rows = dedup.shingle_rows(docs.limit(50), "text", "doc_id", n=3)
    arr = docs.limit(50).select(
        F.col("doc_id").alias("doc"),
        F.explode(dedup.word_shingles("text", 3)).alias("s"),
    ).distinct()
    assert rows.exceptAll(arr).count() == 0
    assert arr.exceptAll(rows).count() == 0


def test_minhash_lsh_recall_vs_exact(spark, docs):
    exact = dedup.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.7)
    lsh = dedup.minhash_dedup_pairs(docs, "text", "doc_id", verify_threshold=0.7)
    exact_pairs = {(r.doc_a, r.doc_b) for r in exact.collect()}
    lsh_pairs = {(r.doc_a, r.doc_b) for r in lsh.collect()}
    # LSH+verify ⊆ exact always; at jaccard≥0.7 with 16×4 bands the
    # S-curve gives ≳99% per-pair recall
    assert lsh_pairs <= exact_pairs
    if exact_pairs:
        assert len(lsh_pairs) >= 0.8 * len(exact_pairs)


def test_minhash_verified_equals_exact_at_half(spark, docs):
    """The rows-only LSH twins (q_dedup_cluster_lsh /
    q_contamination_lsh) claim equality with their exact oracle-checked
    twins on the bundled corpora (near-dup pairs sit far above the
    S-curve knee, so verified-LSH output == exact output at 0.5).
    This pins that claim at the pair-generator level; the query-level
    equality test below pins the composed pipelines."""
    exact = dedup.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    lsh = dedup.minhash_dedup_pairs(
        docs, "text", "doc_id", num_perm=64, bands=16, verify_threshold=0.5
    )
    e = {(r.doc_a, r.doc_b, r.jaccard) for r in exact.collect()}
    m = {(r.doc_a, r.doc_b, r.jaccard) for r in lsh.collect()}
    assert e, "corpus should contain near-dup pairs"
    assert m == e


def test_editdist_lsh_fed_equals_blocked_join(spark, docs, sf_dir):
    """r5 verdict #4: editdist_pairs fed with MinHash-LSH candidate
    pairs (the open-scale path — no full-body blocking join) must
    reproduce the blocked-join output on the bundled corpus, where
    every small-edit pair both shares its 2-word prefix and sits far
    above the LSH S-curve knee."""
    blocked = dedup.editdist_pairs(docs, "text", "doc_id")
    cand = dedup.minhash_dedup_pairs(
        docs, "text", "doc_id", num_perm=64, bands=16, verify_threshold=None
    )
    fed = dedup.editdist_pairs(docs, "text", "doc_id", candidates=cand)
    b = sorted(map(tuple, blocked.collect()))
    f = sorted(map(tuple, fed.collect()))
    assert b, "corpus should contain small-edit near-dup pairs"
    assert f == b
    # the registered query twin composes the same pipeline
    from tmp_parquet_merge_spark.queries import REGISTRY

    q = REGISTRY["q_dedup_editdist_lsh"].build(spark, sf_dir)
    assert sorted(map(tuple, q.collect())) == b


def test_lsh_twin_queries_equal_exact_on_bundled_corpus(spark, sf_dir):
    """q_dedup_cluster_lsh / q_contamination_lsh are registered
    rows-only because LSH recall at the J=0.5 boundary is
    probabilistic on adversarial data — but on the bundled corpora
    they must equal their exact oracle-checked twins row for row."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    for exact_name, lsh_name in [
        ("q_dedup_cluster", "q_dedup_cluster_lsh"),
        ("q_contamination", "q_contamination_lsh"),
    ]:
        exact = REGISTRY[exact_name].build(spark, sf_dir)
        lsh = REGISTRY[lsh_name].build(spark, sf_dir)
        assert sorted(map(tuple, exact.collect())) == sorted(
            map(tuple, lsh.collect())
        ), f"{lsh_name} != {exact_name}"


def test_all_pairs_twins_are_input_capped(spark, sf_dir):
    """The exact pair generators are worst-case quadratic; every
    registered query that uses one must carry the _PAIR_CAP input
    filter so the plan cannot be pointed at a large corpus (the cap
    appears in the oracle SQL too, keeping hash parity)."""
    from tmp_parquet_merge_spark.queries import REGISTRY
    from tmp_parquet_merge_spark.queries_llm import _PAIR_CAP

    # Plans that pass through a localCheckpoint (q_dedup_cluster's
    # iterative min-label propagation; the shingle-pair twins'
    # _sized_shingles materialization) surface as a LogicalRDD, so the
    # cap filter is only visible in the plans of the remaining
    # queries; every oracle cap is still asserted below (hash parity
    # then forces the engine-side cap to match at sf0.01).
    for name, id_col in [
        ("q_dedup_embedding", "vec_id"),
    ]:
        plan = (
            REGISTRY[name]
            .build(spark, sf_dir)
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        # the literal may print as `< 20000` or `< cast(20000 as bigint)`
        assert (
            id_col in plan and str(_PAIR_CAP) in plan
        ), f"{name} missing _PAIR_CAP filter on {id_col}"
    for name in [
        "q_dedup_ngram",
        "q_dedup_embedding",
        "q_dedup_cluster",
        "q_contamination",
    ]:
        assert str(_PAIR_CAP) in (REGISTRY[name].oracle or ""), (
            f"{name} oracle uncapped"
        )


def test_simhash_detects_identical_docs(spark, docs):
    base = docs.limit(20)
    dup = base.withColumn("doc_id", F.col("doc_id") + 100000)
    both = base.unionAll(dup)
    pairs = dedup.simhash_dedup_pairs(both, "text", "doc_id", max_hamming=0)
    found = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    expected = {(r.doc_id, r.doc_id + 100000) for r in base.collect()}
    assert expected <= found


def test_brute_force_topk_shape_and_selfexclusion(spark, emb):
    out = similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 3), k=5)
    rows = out.collect()
    assert len(rows) == 15
    assert all(r.n_vec != r.q_vec for r in rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_vec, []).append(r.sim)
    for sims in by_q.values():
        assert sims == sorted(sims, reverse=True)


def test_ann_lsh_exact_twin_on_bundled_corpus(spark, emb):
    """The q_ann_lsh oracle-equality contract (r8): at the default
    512-bit sketch / 300-candidate over-fetch, the candidate set
    covers the true top-10 on the bundled embeddings, so ann_topk is
    ROW-IDENTICAL to brute force — ids AND rounded sims.  A miss here
    means the exact-twin SQL oracle would hash-fail on the driver."""
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.q_vec, r.n_vec, r.sim)
        for r in similarity.brute_force_topk(emb, q, k=10).collect()
    }
    approx = {
        (r.q_vec, r.n_vec, r.sim)
        for r in similarity.ann_topk(emb, q, dim=64, k=10).collect()
    }
    assert approx == exact


def test_ann_lsh_exact_twin_at_driver_sf(spark):
    """Same equality at sf0.01 — the tier the correctness driver
    hashes at (the parity fixture runs sf0.001; both must hold)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.q_vec, r.n_vec, r.sim)
        for r in similarity.brute_force_topk(emb, q, k=10).collect()
    }
    approx = {
        (r.q_vec, r.n_vec, r.sim)
        for r in similarity.ann_topk(emb, q, dim=64, k=10).collect()
    }
    assert approx == exact


def test_ann_lsh_recall_floor_at_bench_sf(spark):
    """Recall ≥ 0.9 at sf0.1 (2000 uniform-random vectors — the SRP
    worst case).  The 512-bit/300-candidate default actually measures
    1.0 here (check_oracle passes at sf0.1 too); this floor is the
    graceful-degradation CONTRACT, deliberately looser than today's
    measurement so knob tuning has room without dishonesty."""
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.q_vec, r.n_vec)
        for r in similarity.brute_force_topk(emb, q, k=10).collect()
    }
    approx = {
        (r.q_vec, r.n_vec)
        for r in similarity.ann_topk(emb, q, dim=64, k=10).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.9


def test_ann_lsh_recall_clustered(spark):
    # 20 clusters × 25 members: cluster center ± small noise — the
    # structure real embedding corpora have.  Hamming sketch ranking
    # concentrates hard here: require ≥0.9 (the r7 banded form only
    # managed the 0.8 floor this test used to carry).
    import random

    rnd = random.Random(7)
    rows = []
    for c in range(20):
        center = [rnd.gauss(0, 1) for _ in range(64)]
        for m in range(25):
            vec = [x + rnd.gauss(0, 0.15) for x in center]
            rows.append((c * 25 + m, [float(v) for v in vec]))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    q = df.filter(F.col("vec_id") % 25 == 0)  # one query per cluster
    exact = {
        (r.q_vec, r.n_vec) for r in similarity.brute_force_topk(df, q, k=10).collect()
    }
    approx = {
        (r.q_vec, r.n_vec) for r in similarity.ann_topk(df, q, dim=64, k=10).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.9


def test_ivf_topk_runs_and_ranks(spark, emb):
    out = similarity.ivf_topk(emb, emb.filter(F.col("vec_id") < 2), k=5).collect()
    assert {r.q_vec for r in out} == {0, 1}
    assert all(-1.0 <= r.sim <= 1.0 for r in out)


def test_ivf_recall_floor_on_bundled_embeddings(spark, emb):
    """Regression pin after the round-2 similarity rewrite: IVF with
    the k-means-fitted centroids must beat the n_probe/n_cells random-
    probe baseline on the bundled table.  Deterministic (lowest-id
    init, no RNG), so a recall drop here means the index changed."""
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.q_vec, r.n_vec)
        for r in similarity.brute_force_topk(emb, q, k=10).collect()
    }
    got = {
        (r.q_vec, r.n_vec)
        for r in similarity.ivf_topk(
            emb, q, n_cells=16, n_probe=4, k=10
        ).collect()
    }
    # random 4-of-16 probing would land 0.25 in expectation; fitted
    # cells concentrate true neighbors, so require clearly above that
    assert len(got & exact) / len(exact) >= 0.35


def test_ivf_kmeans_centroids_lift_recall(spark):
    # clustered corpus (the IVF use case): k-means-fitted cells must
    # beat the raw lowest-id corpus sample (fit_iters=0, the round-1
    # sampler) and deliver real recall
    import random

    rnd = random.Random(11)
    rows = []
    for c in range(16):
        center = [rnd.gauss(0, 1) for _ in range(32)]
        for m in range(30):
            vec = [x + rnd.gauss(0, 0.15) for x in center]
            rows.append((c * 30 + m, [float(v) for v in vec]))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    q = df.filter(F.col("vec_id") % 30 == 0)
    exact = {
        (r.q_vec, r.n_vec)
        for r in similarity.brute_force_topk(df, q, k=10).collect()
    }

    def recall(fit_iters):
        got = {
            (r.q_vec, r.n_vec)
            for r in similarity.ivf_topk(
                df, q, n_cells=16, n_probe=2, k=10, fit_iters=fit_iters
            ).collect()
        }
        return len(got & exact) / len(exact)

    r_fit, r_sample = recall(5), recall(0)
    assert r_fit >= r_sample
    assert r_fit >= 0.8


def test_ann_ivf_query_emits_consistent_recall_metadata(spark, sf_dir):
    """q_ann_ivf's recall_at_k column (r8 quality metadata): must
    EQUAL the recall recomputed against brute force here, and clear a
    real floor — so a rows-only driver run that sees the column sees
    measured truth, not a decoration."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    rows = REGISTRY["q_ann_ivf"].build(spark, sf_dir).collect()
    emb = spark.read.parquet(sf_dir + "/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {}
    for r in similarity.brute_force_topk(emb, q, k=10).collect():
        exact.setdefault(r.q_vec, set()).add(r.n_vec)
    got = {}
    claimed = {}
    for r in rows:
        got.setdefault(r.q_vec, set()).add(r.n_vec)
        claimed[r.q_vec] = r.recall_at_k
    for qv, nset in got.items():
        true_recall = len(nset & exact[qv]) / len(exact[qv])
        assert abs(claimed[qv] - true_recall) < 1e-3, (qv, claimed[qv], true_recall)
    mean = sum(claimed.values()) / len(claimed)
    # n_probe=6 (r9): measured 0.90 (sf0.001) / 0.90 (sf0.01) /
    # 0.96 (sf0.1); deterministic index, so a drop means code changed
    assert mean >= 0.85, mean


def test_ann_pq_query_emits_consistent_recall_metadata(spark, sf_dir):
    """q_ann_pq's recall_at_k column: equals the recall recomputed
    against brute force, clears the pq floor (same contract as
    q_ann_ivf's)."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    rows = REGISTRY["q_ann_pq"].build(spark, sf_dir).collect()
    emb = spark.read.parquet(sf_dir + "/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {}
    for r in similarity.brute_force_topk(emb, q, k=10).collect():
        exact.setdefault(r.q_vec, set()).add(r.n_vec)
    got, claimed = {}, {}
    for r in rows:
        got.setdefault(r.q_vec, set()).add(r.n_vec)
        claimed[r.q_vec] = r.recall_at_k
    for qv, nset in got.items():
        true_recall = len(nset & exact[qv]) / len(exact[qv])
        assert abs(claimed[qv] - true_recall) < 1e-3, (qv, claimed[qv], true_recall)
    # 8×256 codebooks + 10× re-rank (r9): measured 1.0 (sf0.001) /
    # 1.0 (sf0.01) / 0.96 (sf0.1) / 1.0 (25×); deterministic index
    assert sum(claimed.values()) / len(claimed) >= 0.9


def test_dedup_embedding_lsh_query_equals_exact_twin(spark, sf_dir):
    """r11 oracle graduation (r10 verdict #2): the registered
    q_dedup_embedding_lsh — Hamming-1 multi-probe over-fetch at
    target_recall 1-1e-5, then the SAME exact-cosine filter — must be
    row-identical to the uncapped exact twin on the bundled corpora
    (66/66 sf0.001, 59/59 sf0.01, 920/920 sf0.1; deterministic
    planes, so equality is a corpus property, not a flake)."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    got = {
        (r.vec_a, r.vec_b, r.sim)
        for r in REGISTRY["q_dedup_embedding_lsh"].build(spark, sf_dir).collect()
    }
    emb = spark.read.parquet(sf_dir + "/embeddings.parquet")
    exact = {
        (r.vec_a, r.vec_b, r.sim)
        for r in similarity.embedding_dedup_pairs(emb, threshold=0.4).collect()
    }
    assert got == exact
    assert got  # non-degenerate: the corpus has near-dup pairs


def test_dedup_simhash_hamming_couples_with_jaccard(spark, sf_dir):
    """The r8 quality-coupling floor, now computed IN THE TEST (the
    r12 exactness graduation removed the per-run jaccard stamp —
    rows-only quality evidence superseded by the exact oracle, and the
    stamp's pair×shingles join was the 25× scale bottleneck): tight
    hamming radii must still be genuinely similar text (mean 3-gram
    Jaccard ≥ 0.8 at hamming ≤ 2) and clearly separated from the
    radius-6+ tail — the signature itself still tracks true
    similarity."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    pairs = REGISTRY["q_dedup_simhash"].build(spark, sf_dir)
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    sh = dedup.shingle_rows(docs, "text", "doc_id", n=3)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        pairs.select("doc_a", "doc_b")
        .join(sh.select(F.col("doc").alias("doc_a"), "s"), "doc_a")
        .join(sh.select(F.col("doc").alias("doc_b"), "s"), ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    j = (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.select(F.col("doc").alias("doc_a"), F.col("n").alias("na")), "doc_a", "left")
        .join(sizes.select(F.col("doc").alias("doc_b"), F.col("n").alias("nb")), "doc_b", "left")
        .select(
            "hamming",
            (
                F.coalesce("i", F.lit(0))
                / F.greatest(
                    F.coalesce("na", F.lit(0))
                    + F.coalesce("nb", F.lit(0))
                    - F.coalesce("i", F.lit(0)),
                    F.lit(1),
                )
            ).alias("jaccard"),
        )
        .collect()
    )
    low = [r.jaccard for r in j if r.hamming <= 2]
    high = [r.jaccard for r in j if r.hamming >= 6]
    assert low and high
    mean_low = sum(low) / len(low)
    mean_high = sum(high) / len(high)
    assert mean_low >= 0.8, mean_low
    assert mean_low >= 10 * mean_high, (mean_low, mean_high)


def test_embedding_lsh_pairs_subset_of_exact(spark, emb):
    exact = {
        (r.vec_a, r.vec_b, r.sim)
        for r in similarity.embedding_dedup_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b, r.sim)
        for r in similarity.embedding_dedup_pairs_lsh(emb, threshold=0.4).collect()
    }
    # candidates are verified with the same exact cosine, so LSH output
    # is a strict subset; recall floor is loose (uniform-ish vectors at
    # cos 0.4 are the SRP S-curve's hard regime)
    assert lsh <= exact
    if exact:
        assert len(lsh) / len(exact) >= 0.2


def test_stopword_ratio_escapes_metacharacters(spark, monkeypatch):
    """r6 advisor: a stopword containing a regex metacharacter must
    match as a literal token (the list_filter token-equality
    contract), never as a regex — "c." must not swallow "cx"."""
    from tmp_parquet_merge_spark.operators import text as text_ops

    monkeypatch.setitem(text_ops.STOPWORDS, "xx", ["c.", "+"])
    df = spark.createDataFrame([("c. plus + cx b",)], "t: string")
    r = (
        df.select(text_ops.stopword_ratio("t", "xx").alias("r"))
        .collect()[0]
        .r
    )
    # tokens: [c., plus, +, cx, b] → exactly 2 literal hits out of 5
    assert abs(r - 2 / 5) < 1e-9


def test_stopword_ratio_escaped_pattern_identical_for_alpha_lists(spark):
    """The escaped en/de/fr patterns are byte-identical to the r6
    unescaped ones (alphabetic words), so every language-ID/quality
    consumer keeps its exact counts."""
    import re

    from tmp_parquet_merge_spark.operators.text import STOPWORDS

    for lang, wordlist in STOPWORDS.items():
        assert [re.escape(w) for w in wordlist] == wordlist, lang


def test_auto_lsh_params_holds_recall_at_open_scale():
    """r6 advisor: the old max_bands=32 clamp silently dropped the
    cosine-0.9 design-point recall to ~44% by n=1e9.  Bands are now
    uncapped by default; assert analytically (pure function, no data)
    that the returned (bits, bands) keep recall ≥ 0.9 from the bundled
    corpus size up through 1e9 vectors, with only ~n^0.22 band growth."""
    import math

    p1 = 1 - math.acos(0.9) / math.pi
    prev_bands = 0
    for n in (500, 4_000, 4_000_000, 100_000_000, 1_000_000_000):
        bits, bands = similarity._auto_lsh_params(n)
        p_band = p1**bits
        achieved = 1 - (1 - p_band) ** bands
        assert achieved >= 0.9, (n, bits, bands, achieved)
        assert bands >= prev_bands  # monotone growth, no clamp cliff
        prev_bands = bands
    # linear-cost sanity: even at 1e9 the signature stays small
    assert bands <= 256 and bits <= 40


def test_auto_lsh_params_explicit_cap_warns_with_achieved_recall():
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        bits, bands = similarity._auto_lsh_params(
            1_000_000_000, max_bands=32
        )
    assert bands == 32
    assert any("achieved recall" in str(x.message) for x in w)


def test_auto_lsh_params_small_corpus_unchanged():
    """Driver-scale corpora sit far under any clamp: the uncapped
    default is a dead branch there (same params as round 6)."""
    for n in (100, 500, 2500):
        bits, bands = similarity._auto_lsh_params(n)
        assert bands <= 32  # never clamped, so identical to r6 output


def test_embedding_lsh_sizing_targets_operating_threshold():
    """r10 recall graduation guard: embedding_dedup_pairs_lsh must size
    its auto-banding at the OPERATING threshold — the r8 sizing
    targeted cosine 0.9 regardless of the query's threshold and
    measured pair_recall 0.38/0.44 at the 0.4 boundary (4 bands).
    Analytic pin (pure function, no data): the (bits, bands) the
    default knobs produce at the bundled corpus sizes must hold ≥ 0.9
    expected recall at cosine 0.4 under the S-curve formula, and the
    64-band cap must actually bind at sf0.1 scale."""
    import math

    p1 = 1 - math.acos(0.4) / math.pi
    for n, expect_bands in ((500, 29), (2_000, 64)):
        bits, bands = similarity._auto_lsh_params(
            n, high_sim=0.4, target_recall=0.95, max_bands=64
        )
        assert bands == expect_bands, (n, bits, bands)
        achieved = 1 - (1 - p1**bits) ** bands
        assert achieved >= 0.9, (n, bits, bands, achieved)


def test_auto_lsh_params_multiprobe_covers_bundled_tiers():
    """r11 graduation guard: with Hamming-1 multi-probe the sizing at
    the registered knobs (threshold 0.4, target_recall 1-1e-5, 64-band
    cap) must (a) fit under the cap at every bundled corpus size and
    (b) leave per-pair miss probability ≤ 1e-4 at the 0.4 boundary —
    the analytic S-curve pin behind the exact-twin equality the query
    test asserts.  Probing must also never SHRINK per-band collision
    (p_eff ≥ p_plain, strictly greater at any real sizing)."""
    import math

    p1 = 1 - math.acos(0.4) / math.pi
    for n in (500, 2_000):
        bits, bands = similarity._auto_lsh_params(
            n,
            high_sim=0.4,
            target_recall=0.99999,
            max_bands=64,
            probe_flips=1,
        )
        assert bands <= 64, (n, bits, bands)
        p_plain = p1**bits
        p_eff = p_plain + bits * p1 ** (bits - 1) * (1 - p1)
        assert p_eff > p_plain
        miss = (1 - p_eff) ** bands
        assert miss <= 1e-4, (n, bits, bands, miss)


def test_prefix_dedup_catches_truncation(spark):
    # doc 2 is doc 1 truncated mid-way: full-text exact dedup misses
    # it, prefix dedup groups them
    long = "alpha beta gamma " * 20
    df = spark.createDataFrame(
        [(1, long), (2, long[: len(long) // 2]), (3, "totally different text")],
        "doc_id: long, text: string",
    )
    exact = dedup.exact_dedup(df, "text", "doc_id")
    assert exact.count() == 3
    pre = dedup.prefix_dedup(df, "text", "doc_id", n_words=10)
    groups = {r.keep_id: r.n_dupes for r in pre.collect()}
    assert groups[1] == 2 and groups[3] == 1


def test_editdist_pairs_catches_small_edits(spark):
    # doc 2 is doc 1 with a one-word typo fix (tiny edit distance, but
    # every 3-gram through the edited word changes); doc 3 shares the
    # 2-word blocking prefix yet is far in edit distance; doc 4 has a
    # different prefix and never becomes a candidate
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("jumps", "jumped")),
            (3, "the quick red wolf sleeps under a noisy barn at midnight"),
            (4, "a completely different opening sentence entirely"),
        ],
        "doc_id: long, text: string",
    )
    pairs = dedup.editdist_pairs(
        df, "text", "doc_id", prefix_words=2, max_rel_dist_pct=20
    ).collect()
    assert [(r.doc_a, r.doc_b) for r in pairs] == [(1, 2)]
    (p,) = pairs
    assert p.lev == 2  # jumps -> jumped is a 2-char edit
    assert 0.9 < p.sim < 1.0


def test_token_entropy_bounds(spark):
    df = spark.createDataFrame(
        [
            (1, "same same same same same"),          # zero entropy
            (2, "one two three four five"),            # max = ln(5)
            (3, "a a b b"),                            # ln(2)
        ],
        "doc_id: long, text: string",
    )
    got = {r.doc_id: r for r in text.token_entropy(df, "text", "doc_id").collect()}
    import math

    assert got[1].entropy == 0.0
    assert abs(got[2].entropy - round(math.log(5), 6)) < 1e-6
    assert abs(got[3].entropy - round(math.log(2), 6)) < 2e-6


def test_ngram_freq_counts_mentions_and_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat the cat ran"),
            (2, "the cat slept"),
            (3, "dogs bark"),
        ],
        "doc_id: long, text: string",
    )
    out = {r.g: (r.n_mentions, r.n_docs) for r in text.ngram_freq(
        df, "text", "doc_id", n=2, k=10, min_docs=2
    ).collect()}
    assert out["the cat"] == (3, 2)  # two mentions in doc 1, one in doc 2
    assert "dogs bark" not in out  # single-doc gram filtered


def test_pack_sequences_layout_invariants(spark, docs):
    from tmp_parquet_merge_spark.operators import curation

    base = docs.select(
        "doc_id", "source", F.size(dedup.words("text")).alias("n_tokens")
    )
    out = curation.pack_sequences(
        base, "doc_id", "n_tokens", budget=512, part_col="source"
    ).collect()
    assert len(out) == docs.count()
    # offsets live inside the budget, packs are dense per source
    assert all(0 <= r.pack_offset < 512 for r in out)
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for rows in by_src.values():
        rows.sort(key=lambda r: r.doc_id)
        total_before = 0
        for r in rows:
            assert r.pack_id == total_before // 512
            assert r.pack_offset == total_before % 512
            total_before += r.n_tokens


def test_language_id_on_known_text(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog is in the house"),
            (2, "der hund ist ein tier und die katze ist auch ein tier"),
            (3, "le chat est dans la maison et les chiens sont dans le jardin"),
            (4, "zzz qqq xxx yyy www"),
        ],
        "doc_id: long, text: string",
    )
    got = {r.doc_id: r.pred_lang for r in text.language_id(df, "text", "doc_id").collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_quality_score_flags_degenerate_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 5),
            (2, "a a a a a a a a a a a a a a a a a a a a a a a a a"),
            (3, "word"),
        ],
        "doc_id: long, text: string",
    )
    got = {r.doc_id: r for r in text.quality_score(df, "text", "doc_id").collect()}
    assert got[1].quality == 1.0
    assert got[2].s_diversity == 0.0
    assert got[3].s_length == 0.0


def test_multimodal_features_shape(spark, sf_dir):
    media = multimodal.media_table(spark, sf_dir)
    feats = multimodal.extract_features(media, bins=16)
    rows = feats.limit(20).collect()
    assert all(len(r.features) == 16 for r in rows)
    assert all(abs(sum(r.features) - 1.0) < 1e-6 for r in rows)
    # text payloads never take the image-decode path, with or without
    # a codec in the environment
    assert all(r.decoded is False for r in rows)


def test_multimodal_oracle_preconditions_hold_on_bundled_corpora():
    """The q_multimodal_features oracle assumes two properties of the
    documents corpus that the Spark side does not share on violation:
    (1) no NULL text — Spark's featurize maps an empty payload to an
    all-zero vector with argmax bin 0, while the oracle's
    list_position over NULL counts yields NULL; (2) no payload that
    PIL would parse as a text-format image (PPM/PGM 'P1'..'P6'
    headers, XBM '#define') — on a codec-equipped box such a payload
    flips featurize to the pixel-histogram path while the oracle
    keeps counting bytes.  Both hold on the bundled corpora; this
    test makes a regenerated corpus that breaks either assumption
    fail HERE instead of as a driver hash mismatch."""
    import duckdb

    for sf in ("0.001", "0.01", "0.1"):
        con = duckdb.connect()
        nulls, pil_magic = con.execute(
            f"""
            SELECT COUNT(*) FILTER (text IS NULL),
                   COUNT(*) FILTER (
                       regexp_matches(text, '^P[1-6]\\s')
                       OR text LIKE '#define%')
            FROM read_parquet('/root/testdata/sf{sf}/documents.parquet')
            """
        ).fetchone()
        assert nulls == 0, f"sf{sf}: {nulls} NULL texts"
        assert pil_magic == 0, f"sf{sf}: {pil_magic} PIL-magic texts"


def test_multimodal_real_codec_decodes_images(spark):
    """With PIL present, real image payloads route through the decoder
    (decoded=True, pixel-histogram features); skipped where the
    environment has no codec — the upgrade path needs no code change
    (r5 verdict #6)."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (32, 32), color=128).save(buf, format="PNG")
    png = buf.getvalue()
    media = spark.createDataFrame(
        [(1, bytearray(png), {"mime": "image/png", "n_bytes": len(png), "source": "t"}),
         (2, bytearray(b"plain text"), {"mime": "text/plain", "n_bytes": 10, "source": "t"})],
        multimodal.MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in multimodal.extract_features(media, bins=16).collect()}
    assert rows[1].decoded is True
    # a uniform gray image concentrates the pixel histogram in 1 bin
    assert max(rows[1].features) == 1.0
    assert rows[2].decoded is False
    assert feats.count() == media.count()


def test_multimodal_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\xff\xd8\xff")


def test_frame_sample_offsets(spark, sf_dir):
    media = multimodal.media_table(spark, sf_dir).limit(10)
    frames = multimodal.frame_sample(media, every_n_bytes=64, max_frames=8)
    rows = frames.collect()
    assert all(r.byte_offset == r.frame_idx * 64 for r in rows)
    assert all(len(r.frame_bytes) <= 16 for r in rows)


def test_dedup_clusters_components(spark):
    # crafted graph: chain 1-2-3, pair 5-6, singletons 4 and 7
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a: long, doc_b: long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id: long")
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.dedup_clusters(pairs, nodes, "doc_id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_dedup_clusters_long_chain_converges(spark):
    # a 20-node path is the worst case for min-label propagation:
    # needs O(diameter) rounds, still must converge under max_iter
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 20)], "doc_a: long, doc_b: long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 21)], "doc_id: long")
    out = dedup.dedup_clusters(pairs, nodes, "doc_id")
    assert out.select("cluster_id").distinct().collect()[0][0] == 1
    assert out.count() == 20


def test_split_assign_deterministic_partition(spark, docs):
    from tmp_parquet_merge_spark.operators import curation

    a = curation.split_assign(docs, "doc_id")
    # total partition: every doc exactly once, only the three labels
    assert a.count() == docs.count()
    labels = {r.split for r in a.select("split").distinct().collect()}
    assert labels <= {"train", "val", "test"}
    # deterministic: a second evaluation is row-identical
    b = curation.split_assign(docs, "doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # ~81/12/6 split within loose bounds
    n = docs.count()
    frac = {
        r.split: r["cnt"] / n
        for r in a.groupBy("split").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert 0.6 < frac.get("train", 0) < 0.95


def test_tfidf_surfaces_distinctive_term(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the log"),
            (3, "the bird flew over the log"),
        ],
        "doc_id: long, text: string",
    )
    out = text.tfidf_top_terms(df, "text", "doc_id", k=2)
    rows = out.collect()
    # ≤ k rows per doc, and every doc's top term is unique to it
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert all(len(v) <= 2 for v in per_doc.values())
    top = {d: max(v, key=lambda r: r.tfidf).term for d, v in per_doc.items()}
    assert top[1] in {"cat", "mat"}
    assert top[3] in {"bird", "flew", "over"}
    # shared-by-all terms score exactly 0 (ln N/N)
    assert all(r.tfidf >= 0 for r in rows)


def test_stratified_sample_rates_and_edges(spark, docs):
    from tmp_parquet_merge_spark.operators import curation

    base = docs.select("doc_id", "source")
    # rate 1.0 keeps everything; rate 0.0 keeps nothing
    all_src = [r.source for r in base.select("source").distinct().collect()]
    keep_all = curation.stratified_sample(
        base, "doc_id", "source", {}, default_rate=1.0
    )
    assert keep_all.count() == base.count()
    drop_all = curation.stratified_sample(
        base, "doc_id", "source", {s: 0.0 for s in all_src}, default_rate=0.0
    )
    assert drop_all.count() == 0
    # a 25% stratum keeps roughly a quarter (loose bound at small n)
    some = curation.stratified_sample(
        base, "doc_id", "source", {}, default_rate=0.25
    )
    frac = some.count() / base.count()
    assert 0.05 < frac < 0.5
    # sampling is a subset of the input and deterministic
    again = curation.stratified_sample(
        base, "doc_id", "source", {}, default_rate=0.25
    )
    assert some.exceptAll(again).count() == 0
    assert some.join(base, ["doc_id", "source"], "left_anti").count() == 0


def test_kmeans_clusters_separated_blobs(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    for c, center in enumerate([0.0, 10.0, -10.0]):
        for i in range(30):
            rows.append(
                (c * 30 + i, (center + rng.randn(4) * 0.1).tolist())
            )
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    got = similarity.kmeans_fit(df, k=3, max_iter=10).collect()
    by_true = {}
    for r in got:
        by_true.setdefault(r.vec_id // 30, set()).add(r.cluster)
    # three well-separated blobs → each maps to exactly one cluster,
    # and no two blobs share one
    assert all(len(s) == 1 for s in by_true.values())
    assert len(set.union(*by_true.values())) == 3


def test_kmeans_fit_stats_converge(spark, emb):
    # the fit-metadata variant must report convergence on the bundled
    # embeddings within the round budget, and labels must match the
    # plain fit (same Lloyd loop, final-assignment semantics)
    stats = similarity.kmeans_fit_with_stats(emb, k=8, max_iter=20)
    rows = stats.collect()
    assert rows and all(r.converged for r in rows)
    assert all(r.n_iter <= 20 and r.final_shift < 1e-6 for r in rows)
    plain = {
        (r.vec_id, r.cluster)
        for r in similarity.kmeans_fit(emb, k=8, max_iter=20).collect()
    }
    assert {(r.vec_id, r.cluster) for r in rows} == plain


def test_chunk_words_covers_every_word(spark, docs):
    # chunk/stride invariants: chunk 0 starts at word 1; consecutive
    # chunks overlap by chunk−stride; concatenating chunk 0 with the
    # non-overlapping tail of every later chunk reconstructs the
    # normalized document exactly — no word lost, none duplicated
    chunk, stride = 16, 12
    out = text.chunk_words(docs.limit(40), "text", "doc_id",
                           chunk=chunk, stride=stride).collect()
    norm = {
        r.doc_id: r.ws
        for r in docs.limit(40)
        .select("doc_id", dedup.words("text").alias("ws")).collect()
    }
    by_doc = {}
    for r in out:
        assert r.n_tokens <= chunk
        assert r.n_tokens == len(r.chunk_text.split(" "))
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text.split(" ")
    assert set(by_doc) == set(norm)
    for doc_id, chunks in by_doc.items():
        assert sorted(chunks) == list(range(len(chunks)))
        rebuilt = list(chunks[0])
        for i in range(1, len(chunks)):
            assert chunks[i][: chunk - stride] == rebuilt[i * stride :]
            rebuilt.extend(chunks[i][chunk - stride :])
        assert rebuilt == norm[doc_id]


def test_weighted_sample_deterministic_and_biased(spark, docs):
    from tmp_parquet_merge_spark.operators import curation

    d = docs.select("doc_id", "n_chars")
    a = curation.weighted_sample(d, "doc_id", "n_chars", k=50).collect()
    b = curation.weighted_sample(d, "doc_id", "n_chars", k=50).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]  # pure function
    assert len(a) == 50
    # length-weighted draw must skew long: the sampled mean length
    # exceeds the corpus mean
    corpus_mean = d.agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = sum(r.n_chars for r in a) / len(a)
    assert sample_mean > corpus_mean


def test_vocab_ids_contiguous_and_ranked(spark, docs):
    out = text.vocab(docs, "text", "doc_id", k=20).collect()
    assert [r.vocab_id for r in out] == list(range(1, len(out) + 1))
    freqs = [r.n_mentions for r in out]
    assert freqs == sorted(freqs, reverse=True)


def test_pq_topk_recall_floor_on_bundled_embeddings(spark, emb):
    """PQ-ADC with exact re-rank: recall vs brute force on the bundled
    corpus.  Codebooks are deterministic (capped lowest-id sample,
    dedup'd init), so a drop here means the index changed."""
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.q_vec, r.n_vec)
        for r in similarity.brute_force_topk(emb, q, k=10).collect()
    }
    approx_df = similarity.pq_topk(emb, q, m=4, ksub=16, k=10).collect()
    approx = {(r.q_vec, r.n_vec) for r in approx_df}
    # 4×16 codes on 64-dim uniform vectors is a coarse sketch; the
    # 4k-candidate exact re-rank is what buys the floor
    assert len(approx & exact) / len(exact) >= 0.5
    # per-query exactly k rows, self excluded
    by_q = {}
    for r in approx_df:
        assert r.n_vec != r.q_vec
        by_q.setdefault(r.q_vec, []).append(r.sim)
    assert all(len(v) == 10 for v in by_q.values())


def test_pq_codes_compress_and_rerank_is_exact(spark):
    """On clustered data PQ must deliver high recall: cluster centers
    are far apart, so 4-byte codes separate them cleanly."""
    import random

    rnd = random.Random(11)
    rows = []
    for c in range(10):
        center = [rnd.gauss(0, 1) for _ in range(64)]
        for m in range(20):
            vec = [x + rnd.gauss(0, 0.1) for x in center]
            rows.append((c * 20 + m, [float(v) for v in vec]))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    q = df.filter(F.col("vec_id") % 20 == 0)
    exact = {
        (r.q_vec, r.n_vec)
        for r in similarity.brute_force_topk(df, q, k=10).collect()
    }
    approx = {
        (r.q_vec, r.n_vec)
        for r in similarity.pq_topk(df, q, m=4, ksub=16, k=10).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.8


def test_semantic_dedup_drops_exact_copies_keeps_reps(spark):
    """A corpus of duplicated vectors: every cluster representative is
    kept, and any exact copy of it (cosine 1.0) is dropped."""
    import random

    rnd = random.Random(3)
    rows = []
    for c in range(8):
        center = [rnd.gauss(0, 1) for _ in range(64)]
        for m in range(6):
            # members 0-2: exact copies; 3-5: far-off noise vectors
            if m < 3:
                vec = list(center)
            else:
                vec = [rnd.gauss(0, 1) for _ in range(64)]
            rows.append((c * 6 + m, [float(v) for v in vec]))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")

    from tmp_parquet_merge_spark.queries import REGISTRY
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "embeddings.parquet"))
        out = REGISTRY["q_dedup_semantic"].build(spark, d).collect()

    by_id = {r.vec_id: r for r in out}
    assert len(by_id) == len(rows)
    # each cluster's min-id member is its representative and is kept
    clusters = {}
    for r in out:
        clusters.setdefault(r.cluster, []).append(r)
    for members in clusters.values():
        rep = min(members, key=lambda r: r.vec_id)
        assert rep.keep == 1
        for r in members:
            if r.vec_id != rep.vec_id and r.cos_to_rep > 0.95:
                assert r.keep == 0, r


def test_semantic_dedup_decision_matches_numpy(spark):
    # r3 verdict #7: pin the keep/drop decision (not just the fit —
    # that has its own NumPy pin) at sf0.01.  Spark's cluster
    # assignment is taken as given; everything downstream of it —
    # representative = min vec_id, cosine-to-representative, the
    # 0.95 keep threshold — is recomputed in NumPy and must agree
    # exactly on every row.
    import numpy as np
    import pandas as pd

    from tmp_parquet_merge_spark.queries import REGISTRY

    sf_dir = "/root/testdata/sf0.01"
    rows = REGISTRY["q_dedup_semantic"].build(spark, sf_dir).collect()
    assert rows

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    E = np.array(emb["embedding"].tolist(), dtype=np.float64)
    n = np.linalg.norm(E, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    E = E / n
    idx = {int(v): i for i, v in enumerate(emb["vec_id"])}

    cluster_of = {r.vec_id: r.cluster for r in rows}
    assert len(cluster_of) == len(emb)  # every vector decided once
    rep = {}
    for vid, c in cluster_of.items():
        rep[c] = min(rep.get(c, vid), vid)
    n_drop = 0
    for r in rows:
        c = cluster_of[r.vec_id]
        cos = float(np.round(E[idx[r.vec_id]] @ E[idx[rep[c]]], 6))
        assert abs(r.cos_to_rep - cos) < 1e-9, (r.vec_id, r.cos_to_rep, cos)
        want_keep = int(r.vec_id == rep[c] or cos <= 0.95)
        assert r.keep == want_keep, (r.vec_id, r.keep, want_keep)
        n_drop += 1 - want_keep
    # every representative keeps itself even in a tight cluster
    assert all(
        r.keep == 1 for r in rows if r.vec_id == rep[cluster_of[r.vec_id]]
    )


def test_minhash_rejects_non_dividing_bands(spark):
    """bands must divide num_perm: a silent floor-division drops
    signature lanes, and bands > num_perm makes every band key the
    hash of an EMPTY slice — all docs collide and the candidate set
    is the full O(n^2) cross product."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id: long, text: string")
    with pytest.raises(ValueError, match="evenly divide"):
        dedup.minhash_dedup_pairs(df, "text", "doc_id", num_perm=64, bands=10)
    with pytest.raises(ValueError, match="evenly divide"):
        dedup.minhash_dedup_pairs(df, "text", "doc_id", num_perm=64, bands=100)


def test_dedup_clusters_string_ids_converge(spark):
    """String doc ids must propagate to a true fixpoint: the numeric
    convergence probe (sum of cast(label as decimal)) yields NULL for
    strings and NULL == NULL would declare convergence after ONE round,
    leaving a chain half-labeled."""
    pairs = spark.createDataFrame(
        [("d1", "d2"), ("d2", "d3"), ("d3", "d4")],
        "doc_a: string, doc_b: string",
    )
    nodes = spark.createDataFrame(
        [("d1",), ("d2",), ("d3",), ("d4",), ("z9",)], "doc_id: string"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.dedup_clusters(pairs, nodes, "doc_id").collect()
    }
    assert got == {"d1": "d1", "d2": "d1", "d3": "d1", "d4": "d1", "z9": "z9"}


def test_editdist_empty_norm_pair_sim_is_one(spark):
    """Two whitespace-only docs normalize to '' on both sides: the
    pair is trivially identical and must report sim = 1.0, not the
    NaN/NULL a division by max-length 0 produces."""
    # both all-space: trim runs BEFORE the collapse (same order as the
    # DuckDB oracle), so space-only docs normalize to '' while
    # tab/newline-only docs normalize to a single interior ' '
    df = spark.createDataFrame(
        [(1, "   "), (2, " ")], "doc_id: long, text: string"
    )
    rows = dedup.editdist_pairs(df, "text", "doc_id").collect()
    assert len(rows) == 1 and rows[0].sim == 1.0 and rows[0].lev == 0
    # candidate-fed path too
    cand = spark.createDataFrame([(1, 2)], "doc_a: long, doc_b: long")
    rows = dedup.editdist_pairs(df, "text", "doc_id", candidates=cand).collect()
    assert len(rows) == 1 and rows[0].sim == 1.0


def test_normalize_text_vertical_tab_matches_duckdb(spark):
    """Java's \\s matches \\x0B but RE2/DuckDB's does not; the
    explicit whitespace class pins the RE2 meaning on the Spark side
    so content hashes agree across engines for \\x0B documents."""
    import duckdb

    df = spark.createDataFrame([("a\x0bb",), ("a  b",)], "text: string")
    got = [
        r.n for r in df.select(dedup.normalize_text("text").alias("n")).collect()
    ]
    duck = [
        r[0]
        for r in duckdb.connect()
        .execute(
            "SELECT regexp_replace(lower(trim(t)), '\\s+', ' ', 'g') "
            "FROM (VALUES ('a\x0bb'), ('a  b')) v(t)"
        )
        .fetchall()
    ]
    assert got == duck  # ['a\x0bb', 'a b'] — \x0B is NOT whitespace
    # and the bundled driver corpus contains no \x0B, so digests from
    # earlier rounds are unchanged by the regex spelling change
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert docs.filter(F.col("text").contains("\x0b")).count() == 0


def test_avg_word_len_closed_form_matches_hof(spark):
    """length(norm) - (n_words - 1) == sum(len(word)) for every doc
    (norm is exactly the words joined by single spaces), including
    the empty doc where split gives ['']."""
    df = spark.createDataFrame(
        [(1, "alpha bé gamma"), (2, ""), (3, "  x  "), (4, "one")],
        "id: long, text: string",
    )
    ws = dedup.words("text")
    hof = F.aggregate(ws, F.lit(0), lambda a, w: a + F.length(w))
    closed = F.length(dedup.normalize_text("text")) - (F.size(ws) - F.lit(1))
    assert df.filter(hof != closed).count() == 0
    stats = {r.id: r.avg_word_len for r in text.text_stats(df, "text", "id").collect()}
    assert stats[4] == 3.0 and stats[2] == 0.0


def test_simhash_query_keeps_pairs_with_empty_shingle_sets(spark, tmp_path):
    """Empty/whitespace-only docs still carry simhash signatures and
    must collide at hamming 0 (the r8 regression class: any auxiliary
    join must never drop pairs the operator found — now the query IS
    just the operator, pinned for the degenerate-document shape)."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    docs = spark.createDataFrame(
        [
            (1, "   ", "en"),
            (2, " \t ", "en"),
            (3, "the quick brown fox jumps over the lazy dog", "en"),
            (4, "the quick brown fox jumps over the lazy dog", "en"),
        ],
        "doc_id: long, text: string, lang: string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = REGISTRY["q_dedup_simhash"].build(spark, str(tmp_path)).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    assert got.get((1, 2)) == 0, got  # identical (empty) signatures collide
    assert got.get((3, 4)) == 0, got


def test_ann_lsh_query_survives_arrow_fallback(spark, sf_dir):
    """The r8 correctness driver crashed q_ann_lsh because ann_topk's
    broadcast query frame held numpy.float64 rows and the driver's
    session took the NON-Arrow createDataFrame path, which rejects
    numpy scalars inside array<double> (FIELD_DATA_TYPE_UNACCEPTABLE).
    Pin the fallback path explicitly: with Arrow conversion disabled,
    the query must still build and produce rows."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        assert REGISTRY["q_ann_lsh"].build(spark, sf_dir).count() > 0
    finally:
        spark.conf.set(key, prev)


def test_dedup_segments_finds_cross_doc_boilerplate(spark, tmp_path):
    """q_dedup_segments (r9): a 10-word boilerplate window shared by
    three docs is reported with doc_freq 3; within-doc repetition does
    not inflate the count (distinct doc_id); unique windows and docs
    under 10 words emit nothing."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    boiler = "please subscribe to our newsletter for updates terms of service"
    assert len(boiler.split()) == 10
    docs = spark.createDataFrame(
        [
            (1, boiler + " alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
            # boilerplate twice in one doc: two aligned windows, same text
            (2, boiler + " " + boiler, "en"),
            (3, boiler + " one two three four five six seven eight nine ten", "en"),
            (4, "completely different words that appear nowhere else in corpus", "en"),
            (5, "short doc", "en"),
        ],
        "doc_id: long, text: string, lang: string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r.segment: r.doc_freq
        for r in REGISTRY["q_dedup_segments"].build(spark, str(tmp_path)).collect()
    }
    assert rows == {boiler: 3}


def test_segments_clean_strips_boilerplate_keeps_tail(spark, tmp_path):
    """q_segments_clean (r9): shared boilerplate windows are removed,
    unique windows and ragged tails survive in order, one output row
    per input doc (all-boilerplate docs come back empty, short docs
    pass through normalized)."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    boiler = "please subscribe to our newsletter for updates terms of service"
    uniq1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, boiler + " " + uniq1 + " tail words", "en"),
            (2, boiler, "en"),
            (3, boiler + " unrelated closing", "en"),
            (4, "Short  DOC", "en"),
        ],
        "doc_id: long, text: string, lang: string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: (r.clean_text, r.n_dropped)
        for r in REGISTRY["q_segments_clean"].build(spark, str(tmp_path)).collect()
    }
    assert out[1] == (uniq1 + " tail words", 1)
    assert out[2] == ("", 1)  # all boilerplate, row survives as empty
    assert out[3] == ("unrelated closing", 1)
    assert out[4] == ("short doc", 0)  # normalized pass-through


def test_dedup_substring_spans_and_union_cover(spark, tmp_path):
    """q_dedup_substring (r10): a 25-word chunk shared at DIFFERENT
    offsets is one qualifying span with exact word cover; a shared
    12-word chunk (< 20-word minimum) is excluded; two close spans
    whose 10-word gram covers overlap are counted by UNION (the
    lag-capped sum), not double-counted."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    W = [f"w{i:02d}" for i in range(1, 41)]  # w01..w40
    S = [f"s{i}" for i in range(25)]  # 25-word shared chunk
    T = [f"t{i}" for i in range(12)]  # 12-word chunk: below min_len
    uniq = iter(f"u{i}" for i in range(200))

    def take(n):
        return [next(uniq) for _ in range(n)]

    docs = spark.createDataFrame(
        [
            (1, " ".join(S + take(10)), "en"),
            (2, " ".join(take(3) + S + take(2)), "en"),
            (3, " ".join(T + take(20)), "en"),
            (4, " ".join(take(5) + T + take(8)), "en"),
            # doc 8 shares w01..w20 with doc 9 and w14..w33 with doc 10:
            # marked runs 0..10 and 13..23 — their word covers overlap
            # (words 13..19), union cover = 33 of 40 words
            (8, " ".join(W), "en"),
            (9, " ".join(W[:20] + take(10)), "en"),
            (10, " ".join(take(10) + W[13:33]), "en"),
        ],
        "doc_id: long, text: string, lang: string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r
        for r in REGISTRY["q_dedup_substring"]
        .build(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == {1, 2, 8, 9, 10}  # 3/4's chunk is too short
    want = {
        1: (35, 1, 25),
        2: (30, 1, 25),
        8: (40, 2, 33),  # 20 + 20 shared, 33 after union of overlap
        9: (30, 1, 20),
        10: (30, 1, 20),
    }
    for doc_id, (n_words, spans, cover) in want.items():
        r = out[doc_id]
        assert (r.n_words, r.dup_spans, r.dup_words) == (
            n_words,
            spans,
            cover,
        ), r
        assert abs(r.frac_dup - round(cover / n_words, 6)) < 1e-9, r
    # the ACTION half on the same fixture: covered words removed in
    # order, one row per input doc, unaffected docs pass through
    cleaned = {
        r.doc_id: (r.clean_text, r.n_dropped)
        for r in REGISTRY["q_substring_clean"]
        .build(spark, str(tmp_path))
        .collect()
    }
    assert set(cleaned) == {1, 2, 3, 4, 8, 9, 10}
    texts = {
        r.doc_id: r.text.split()
        for r in docs.select("doc_id", "text").collect()
    }
    # doc 1: S (words 0..24) removed, its 10 unique tail words survive
    assert cleaned[1] == (" ".join(texts[1][25:]), 25)
    # doc 2: the 3 + 2 unique words around S survive, order kept
    assert cleaned[2] == (
        " ".join(texts[2][:3] + texts[2][28:]),
        25,
    )
    # docs 3/4: the 12-word chunk is under min_len — pass-through
    assert cleaned[3] == (" ".join(texts[3]), 0)
    assert cleaned[4] == (" ".join(texts[4]), 0)
    # doc 8: union cover words 0..32 removed, w34..w40 survive
    assert cleaned[8] == (" ".join(texts[8][33:]), 33)
    assert cleaned[9] == (" ".join(texts[9][20:]), 20)
    assert cleaned[10] == (
        " ".join(texts[10][:10] + texts[10][30:]),
        20,
    )


def test_rank_fusion_semantics(spark, sf_dir):
    """q_rank_fusion (r9): rrf_score equals the recomputed
    Σ 1/(60+rank) for every row, docs on both lists outrank
    equal-ranked single-list docs, and the fused ranking is the
    rrf-desc/doc-id order."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    rows = REGISTRY["q_rank_fusion"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        want = 0.0
        if r.bm25_rank is not None:
            want += 1.0 / (60 + r.bm25_rank)
        if r.cos_rank is not None:
            want += 1.0 / (60 + r.cos_rank)
        assert abs(r.rrf_score - round(want, 6)) < 1e-9, r
        assert r.bm25_rank is not None or r.cos_rank is not None
    ordered = sorted(rows, key=lambda r: (-r.rrf_score, r.doc_id))
    assert [r.fused_rank for r in ordered] == list(range(1, len(rows) + 1))
    both = [r for r in rows if r.bm25_rank and r.cos_rank]
    if both:
        best_single = min(
            r.rrf_score for r in rows if not (r.bm25_rank and r.cos_rank)
        )
        # a doc on both lists beats any doc holding a single last place
        assert max(r.rrf_score for r in both) > best_single


def test_substring_digest_spelling_matches_string_spelling(spark, sf_dir):
    """The open-scale wire spelling (xxhash64(gram) keys, 8 bytes on
    the shuffle instead of the ≤10-word string) must produce identical
    output on the bundled corpus — turns the SCALE.md digest claim
    into tested code.  The registered queries keep the string spelling
    for DuckDB-oracle exactness."""
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    for fn in (dedup.substring_dup_spans, dedup.substring_clean):
        s = {tuple(r) for r in fn(docs, "text", "doc_id").collect()}
        h = {
            tuple(r)
            for r in fn(
                docs, "text", "doc_id", digest_grams=True
            ).collect()
        }
        assert s == h, fn.__name__


def test_media_neardup_finds_byte_near_payloads(spark):
    """Blockhash near-dup (r11): two payloads differing in a few bytes
    land within the Hamming radius; an unrelated payload does not.
    Identical payloads must be Hamming 0."""
    base = ("the quick brown fox jumps over the lazy dog " * 40).encode()
    tweaked = bytearray(base)
    tweaked[100:104] = b"XYZQ"  # a localized edit
    df = spark.createDataFrame(
        [
            (1, bytes(base)),
            (2, bytes(tweaked)),
            (3, bytes(base)),  # exact copy of 1
            (4, ("completely different content % & # !! " * 53).encode()),
        ],
        "media_id: long, payload: binary",
    )
    got = {
        (r.media_a, r.media_b): r.hamming
        for r in multimodal.media_neardup_pairs(
            df, radius=10, bands=11
        ).collect()
    }
    assert got[(1, 3)] == 0
    assert (1, 2) in got and got[(1, 2)] <= 10
    assert got[(1, 2)] == got[(2, 3)]
    assert not any(4 in p for p in got)


def test_media_neardup_band_configs_identical_pairs(spark):
    """Multi-index hashing exactness (r12): the pair set is invariant
    across band configurations — bands=11 (f=0, the r11 spelling),
    bands=4 (f=2, the registered plan), bands=3 (f=3) must all emit
    the SAME (pair, hamming) rows, because each is pigeonhole-exact
    for the same radius.  This is the guarantee the plan-only r12
    switch rides on: the oracle did not change, so the candidates
    must not lose pairs."""
    import random

    rng = random.Random(7)
    rows = []
    base = bytes(rng.randrange(256) for _ in range(900))
    for i in range(30):
        b = bytearray(base)
        for _ in range(rng.randrange(0, 60)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        rows.append((i, bytes(b)))
    df = spark.createDataFrame(rows, "media_id: long, payload: binary")
    results = {}
    for bands in (11, 4, 3):
        results[bands] = sorted(
            (r.media_a, r.media_b, r.hamming)
            for r in multimodal.media_neardup_pairs(
                df, radius=10, bands=bands
            ).collect()
        )
    assert results[11] == results[4] == results[3]
    assert results[4], "fixture produced no near-dup pairs"


def test_media_neardup_ball_guard():
    """A band config whose probe ball explodes (e.g. 1 band of 64 bits
    probing Hamming-10) must refuse loudly rather than materialize a
    quarter-trillion-mask literal."""
    import pytest

    with pytest.raises(ValueError, match="probe ball"):
        multimodal.media_neardup_pairs(None, radius=10, bands=1)


def test_media_neardup_signature_matches_reference(spark):
    """The Spark blockhash signature must equal an independent pure-
    Python spelling bit for bit — the property the closed-form DuckDB
    oracle rides on (any drift shows up here, not as a driver hash
    mismatch)."""
    payloads = [
        (1, b""),
        (2, b"a"),
        (3, ("variety text 123 \xc3\xa9 " * 7).encode("latin-1")),
        (4, bytes(range(256)) * 3),
    ]
    df = spark.createDataFrame(payloads, "media_id: long, payload: binary")
    got = {
        r.media_id: (r.lo, r.hi)
        for r in multimodal.blockhash_signatures(df).collect()
    }
    for mid, payload in payloads:
        ph = payload.hex().upper()
        H = len(ph)
        m = [
            sum(1 for c in ph[H * b // 64 : H * (b + 1) // 64] if c > "7")
            for b in range(64)
        ]
        bits = [1 if m[b] > m[(b + 1) % 64] else 0 for b in range(64)]
        lo = sum(bits[i] << i for i in range(32))
        hi = sum(bits[i + 32] << i for i in range(32))
        assert got[mid] == (lo, hi), mid


# ---------------------------------------------------------------------------
# DSIR importance weighting (r11)
# ---------------------------------------------------------------------------


def test_dsir_weights_tilt_toward_target(spark, docs):
    """The importance weight must do its one job: rank target-domain
    (English) documents above the rest on average — the Xie et al.
    2023 selection signal.  Also: total partition (every doc scored),
    n_terms = 2·words − 1 (unigrams + bigrams), determinism."""
    from tmp_parquet_merge_spark.operators import curation, dedup

    out = curation.dsir_weights(docs, "text", "doc_id", "lang", "en")
    assert out.count() == docs.count()

    joined = out.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r["is_en"]: r["m"]
        for r in joined.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("logw").alias("m"))
        .collect()
    }
    assert means[True] > means[False], means

    # n_terms: unigrams + bigrams of the normalized word sequence
    expect = docs.select(
        "doc_id",
        (F.size(dedup.words("text")) * 2 - 1).cast("bigint").alias("e"),
    )
    bad = out.join(expect, "doc_id").filter(F.col("n_terms") != F.col("e"))
    assert bad.count() == 0

    again = curation.dsir_weights(docs, "text", "doc_id", "lang", "en")
    assert out.exceptAll(again).count() == 0


def test_dsir_sample_is_weight_tilted_topk(spark, docs):
    """Gumbel-top-k resample: k rows, deterministic, keys finite, and
    the drawn set's mean logw exceeds the corpus mean (importance
    resampling concentrates on high-weight docs)."""
    import math

    from tmp_parquet_merge_spark.operators import curation

    k = 50
    s = curation.dsir_sample(docs, "text", "doc_id", "lang", "en", k=k)
    rows = s.collect()
    assert len(rows) == min(k, docs.count())
    assert all(math.isfinite(r.sample_key) for r in rows)

    wts = curation.dsir_weights(docs, "text", "doc_id", "lang", "en")
    corpus_mean = wts.agg(F.avg("logw")).collect()[0][0]
    drawn_mean = sum(r.logw for r in rows) / len(rows)
    assert drawn_mean > corpus_mean

    again = curation.dsir_sample(docs, "text", "doc_id", "lang", "en", k=k)
    assert {r.doc_id for r in again.collect()} == {r.doc_id for r in rows}


def test_perplexity_buckets_are_exact_thirds(spark, docs):
    """CCNet bucketing: per-language head/middle/tail counts differ by
    at most 1 (exact integer rank terciles), every doc is assigned,
    and head docs score >= tail docs within each language."""
    from tmp_parquet_merge_spark.operators import text as text_ops

    out = text_ops.lm_buckets(docs, "text", "doc_id", "lang")
    assert out.count() == docs.count()

    per = (
        out.groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    counts = {}
    for r in per:
        counts.setdefault(r.lang, {})[r.bucket] = r.c
    for lang, by in counts.items():
        assert set(by) <= {"head", "middle", "tail"}, (lang, by)
        assert max(by.values()) - min(by.values()) <= 1, (lang, by)

    agg = (
        out.groupBy("lang", "bucket")
        .agg(F.min("lm_score").alias("lo"), F.max("lm_score").alias("hi"))
        .collect()
    )
    rng = {}
    for r in agg:
        rng.setdefault(r.lang, {})[r.bucket] = (r.lo, r.hi)
    for lang, by in rng.items():
        if "head" in by and "tail" in by:
            assert by["head"][0] >= by["tail"][1], (lang, by)

    again = text_ops.lm_buckets(docs, "text", "doc_id", "lang")
    assert out.exceptAll(again).count() == 0


def test_bg_candidate_frac_analytics():
    """The regime-switch gauge: saturated sizings (few bits, many
    bands, multi-probe) must read ~1; selective sizings (many bits,
    no probe) must read ~0; monotone in bands."""
    from tmp_parquet_merge_spark.operators import similarity

    # the registered sf0.1 operating point (3-ish bits, 50+ bands,
    # Hamming-1 probe) is deep in saturation
    assert similarity._bg_candidate_frac(3, 51, 1) > 0.99
    # a real near-dup sizing (20 bits/band, 8 bands, no probe) is
    # selective
    assert similarity._bg_candidate_frac(20, 8, 0) < 1e-4
    assert similarity._bg_candidate_frac(4, 8, 1) >= similarity._bg_candidate_frac(
        4, 4, 1
    )


def test_embedding_lsh_exact_scan_equals_banded(spark, emb):
    """The r11 regime switch must be output-invariant: the blocked
    exact scan (auto-chosen at the bundled operating point) and the
    FORCED banded path (exact_scan_cap=0) emit the same pair set —
    which is also the exact twin's (the graduation contract)."""
    auto = {
        (r.vec_a, r.vec_b, r.sim)
        for r in similarity.embedding_dedup_pairs_lsh(
            emb, threshold=0.4, probe_flips=1, target_recall=0.99999
        ).collect()
    }
    banded = {
        (r.vec_a, r.vec_b, r.sim)
        for r in similarity.embedding_dedup_pairs_lsh(
            emb,
            threshold=0.4,
            probe_flips=1,
            target_recall=0.99999,
            exact_scan_cap=0,
        ).collect()
    }
    exact = {
        (r.vec_a, r.vec_b, r.sim)
        for r in similarity.embedding_dedup_pairs(emb, threshold=0.4).collect()
    }
    assert auto == exact
    assert banded == exact


def test_bigram_lm_ranks_fluency_above_shuffled_frequency(spark):
    """The bigram score's one job: a document of common words in a
    FLUENT order must outscore the same bag of words shuffled — the
    separation the unigram LM (same bag → same score) cannot make.
    Also: total partition, one-word docs retained with NULL score."""
    from tmp_parquet_merge_spark.operators import text as text_ops

    fluent = "the cat sat on the mat and the dog sat on the rug " * 4
    shuffled = "mat the on dog and sat the rug cat the on sat the " * 4
    df = spark.createDataFrame(
        [(1, fluent), (2, shuffled), (3, fluent), (4, "solo")],
        "doc_id: long, text: string",
    )
    out = {r.doc_id: r for r in text_ops.bigram_lm_score(df, "text", "doc_id").collect()}
    assert len(out) == 4
    assert out[4].n_bigrams == 0 and out[4].lm2_score is None
    assert out[1].lm2_score == out[3].lm2_score  # identical docs tie
    assert out[1].lm2_score > out[2].lm2_score, (out[1], out[2])


def test_mix_temperature_flattens_without_inverting(spark, docs):
    """α-sampling semantics: temp shares sum to 1; the mix flattens
    (scarce sources gain share, dominant sources lose) but ORDER is
    preserved — α ∈ (0,1) never inverts the ranking; exactly one
    source (the max-boost one) keeps rate 1.0 and none exceeds it."""
    from tmp_parquet_merge_spark.operators import curation

    rows = curation.mix_temperature(docs, "text", "source", alpha=0.3).collect()
    assert abs(sum(r.temp_share for r in rows) - 1.0) < 1e-4
    by_tokens = sorted(rows, key=lambda r: r.n_tokens)
    scarcest, biggest = by_tokens[0], by_tokens[-1]
    if scarcest.n_tokens < biggest.n_tokens:
        assert scarcest.temp_share > scarcest.actual_share
        assert biggest.temp_share < biggest.actual_share
        # no inversion: bigger source still has >= temp share
        assert biggest.temp_share >= scarcest.temp_share
    assert max(r.sample_rate for r in rows) == 1.0
    assert all(0 < r.sample_rate <= 1.0 for r in rows)


def test_hard_negatives_excludes_same_label_and_self(spark, emb):
    """Every mined negative must carry a label different from its
    query's, never be the query itself, and be the TRUE top-k over
    the different-label candidates (cross-checked per query against
    a driver-side exact computation)."""
    import numpy as np

    from tmp_parquet_merge_spark.operators import similarity

    out = similarity.hard_negatives(
        emb, query_pred=F.col("vec_id") < 5, k=3
    ).collect()
    rows = emb.select("vec_id", "embedding", "label").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    labels = {r.vec_id: r.label for r in rows}
    got = {}
    for r in out:
        assert r.n_vec != r.q_vec
        assert r.n_label != labels[r.q_vec]
        got.setdefault(r.q_vec, []).append((r.n_vec, r.sim))
    for q in got:
        qv = vecs[q] / np.linalg.norm(vecs[q])
        cand = [
            (
                round(float(np.dot(qv, vecs[n] / np.linalg.norm(vecs[n]))), 6),
                n,
            )
            for n in vecs
            if n != q and labels[n] != labels[q]
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        expect = [(n, s) for s, n in cand[:3]]
        assert got[q] == expect, (q, got[q], expect)


def test_tokenizer_fertility_bounds(spark, docs):
    """Fertility >= 1 (the pre-tokenizer never merges across
    whitespace), chars_per_token is positive and bounded by the max
    word length, every language is covered, and doc counts total the
    corpus."""
    from tmp_parquet_merge_spark.operators import text as text_ops

    rows = text_ops.tokenizer_fertility(docs, "text", "doc_id", "lang").collect()
    langs = {r.lang for r in rows}
    assert langs == {r.lang for r in docs.select("lang").distinct().collect()}
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert r.fertility >= 1.0, r
        assert 0 < r.chars_per_token < 30, r


def test_shard_balance_is_balanced_and_total(spark, docs):
    """Sorted round-robin: 16 shards, doc counts differ by <= 1,
    token totals within one max-document of each other, and the
    manifest accounts for every document and token."""
    from tmp_parquet_merge_spark.operators import curation, dedup

    rows = curation.shard_balance(docs, "text", "doc_id", n_shards=16).collect()
    assert len(rows) == 16
    n_total = sum(r.n_docs for r in rows)
    assert n_total == docs.count()
    tok_total = docs.select(
        F.sum(F.size(dedup.words("text"))).alias("t")
    ).collect()[0].t
    assert sum(r.n_tokens for r in rows) == tok_total
    assert max(r.n_docs for r in rows) - min(r.n_docs for r in rows) <= 1
    max_doc = docs.select(
        F.max(F.size(dedup.words("text"))).alias("m")
    ).collect()[0].m
    assert max(r.n_tokens for r in rows) - min(r.n_tokens for r in rows) <= max_doc


def test_ngram_decontaminate_flags_quoted_eval_gram(spark):
    """A train doc quoting a 10-gram from a test doc must be flagged
    with the right collision count; train docs sharing grams only
    with other TRAIN docs must not."""
    import hashlib

    from tmp_parquet_merge_spark.operators import curation

    def split_of(i):
        nib = hashlib.md5(str(i).encode()).hexdigest()[0]
        return "train" if nib <= "c" else ("val" if nib <= "e" else "test")

    train_ids = [i for i in range(200) if split_of(i) == "train"]
    test_ids = [i for i in range(200) if split_of(i) == "test"]
    quote = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (test_ids[0], f"the held out benchmark asks {quote} as its question"),
        # contaminated: quotes the benchmark 10-gram mid-document
        (train_ids[0], f"novel prose here {quote} and more novel prose"),
        # clean train docs sharing a 10-gram only with each other
        (train_ids[1], "one two three four five six seven eight nine ten x"),
        (train_ids[2], "one two three four five six seven eight nine ten y"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {
        r.doc_id: r.n_overlap
        for r in curation.ngram_decontaminate(
            df, "text", "doc_id", n=10
        ).collect()
    }
    assert train_ids[0] in out and out[train_ids[0]] == 1
    assert train_ids[1] not in out and train_ids[2] not in out


def test_winnowing_guarantee_shared_substring(spark):
    """The SIGMOD-2003 winnowing guarantee: any substring shared
    between two documents with length >= k+w-1 (= 15 here) yields at
    least one shared selected fingerprint hash.  Unrelated documents
    share none (40-bit hashes, tiny corpus)."""
    shared = "the winnowing guarantee holds for this span"
    rows = [
        (1, f"prefix alpha {shared} suffix one"),
        (2, f"completely different opening text {shared} and tail"),
        (3, "no overlap here at all: zebra quartz jumble vortex"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    sel = text.winnowing_select(df, "text", "doc_id", k=8, w=8).collect()
    by_doc = {}
    for r in sel:
        by_doc.setdefault(r.doc_id, set()).add(r.h)  # hash only
    assert by_doc[1] & by_doc[2], "shared 43-char span must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_winnowing_density_and_determinism(spark):
    """Expected fingerprint density ~ 2/(w+1) (SIGMOD 2003 Thm 1 for
    random hashes) and exact repeatability: two runs emit identical
    (n_fp, fp_sum) — the property the DuckDB oracle parity rides on."""
    import random

    rng = random.Random(11)
    docs = [
        (i, " ".join("".join(rng.choices("abcdefghij", k=5)) for _ in range(120)))
        for i in range(20)
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    a = {r.doc_id: (r.n_fp, r.fp_sum, r.density)
         for r in text.winnowing_fingerprints(df, "text", "doc_id").collect()}
    b = {r.doc_id: (r.n_fp, r.fp_sum, r.density)
         for r in text.winnowing_fingerprints(df, "text", "doc_id").collect()}
    assert a == b
    densities = [v[2] for v in a.values()]
    mean_d = sum(densities) / len(densities)
    # 2/(w+1) = 0.222 for w=8; generous band for a small sample
    assert 0.15 < mean_d < 0.32, mean_d


def test_zipf_fit_matches_numpy_reference(spark):
    """zipf_fit's OLS slope/intercept equal an independent numpy
    polyfit over the same deterministic (rank, freq) table."""
    import math

    import numpy as np

    words_ = [f"w{i:03d}" for i in range(50)]
    rows = []
    doc = []
    for i, w_ in enumerate(words_):
        doc.extend([w_] * (100 // (i + 1) + 1))  # zipf-ish frequencies
    rows.append((1, " ".join(doc)))
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = text.zipf_fit(df, "text", "doc_id", top_v=1000).collect()[0]
    # reference: same freq/rank construction
    from collections import Counter

    c = Counter(doc)
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.log(np.arange(1, len(ranked) + 1, dtype=float))
    y = np.log(np.array([f for _, f in ranked], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert got.n_types_fit == len(ranked)
    assert got.n_tokens_fit == sum(c.values())
    assert math.isclose(got.zipf_slope, round(float(slope), 6), abs_tol=1e-5)
    assert math.isclose(got.zipf_intercept, round(float(intercept), 6), abs_tol=1e-5)
    assert got.zipf_slope < -0.3  # decreasing frequencies fit a negative slope


def test_simhash_mih_exact_vs_bruteforce(spark):
    """r12 exactness graduation: the multi-index-hashing candidate
    path must emit EXACTLY the pairs a brute-force all-pairs Hamming
    scan finds at radius 8 — including distances 4-8, which the r11
    f=0 chunk banding silently lost."""
    import random

    rng = random.Random(3)
    vocab = [f"tok{i}" for i in range(400)]
    docs = []
    base = [rng.choice(vocab) for _ in range(60)]
    for i in range(40):
        d = list(base)
        for _ in range(rng.randrange(0, 25)):  # graded perturbations
            d[rng.randrange(len(d))] = rng.choice(vocab)
        docs.append((i, " ".join(d)))
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    sigs = {r.doc: r.simhash for r in dedup.simhash(df, "text", "doc_id").collect()}
    brute = {
        (a, b): bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
        for a in sigs
        for b in sigs
        if a < b and bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 8
    }
    for bands in (4, 8):
        got = {
            (r.doc_a, r.doc_b): r.hamming
            for r in dedup.simhash_dedup_pairs(
                df, "text", "doc_id", max_hamming=8, bands=bands
            ).collect()
        }
        assert got == brute, f"bands={bands}"
    assert any(h > 3 for h in brute.values()), (
        "fixture must exercise the distance band the f=0 spelling lost"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divisor of 64"):
        dedup.simhash_dedup_pairs(df, "text", "doc_id", bands=5)


def test_winnow_overlap_detects_shared_spans(spark):
    """MOSS matching semantics: documents sharing a long span match
    with ≥ min_shared fingerprints; a span pasted into MANY documents
    becomes stop-fingerprints (df > max_df) and stops matching —
    the boilerplate rule, pinned with the same span at two corpus
    multiplicities."""
    span = "the quick brown fox jumps over the lazy dog again and again"
    # per-doc preambles are letter triples (no shared substrings
    # between docs — a numbered preamble would leak grams like
    # "amble 1" into "amble 19" and defeat the stop-fingerprint half)
    pre = lambda i: chr(ord("a") + i) * 9
    mk = lambda i, extra: (i, f"{pre(i)} {pre(i)} " + extra)
    # corpus A: span in 3 docs (df <= max_df=16) -> pairs match
    a = [mk(i, span) for i in range(3)] + [mk(i, f"filler {pre(i)} " * 10) for i in range(3, 8)]
    df_a = spark.createDataFrame(a, "doc_id: long, text: string")
    got_a = {
        (r.doc_a, r.doc_b)
        for r in text.winnow_overlap_pairs(
            df_a, "text", "doc_id", min_shared=3
        ).collect()
    }
    assert {(0, 1), (0, 2), (1, 2)} <= got_a
    # corpus B: the same span in 20 docs (> max_df) -> its fingerprints
    # are stop-fingerprints; no pair reaches min_shared through it
    b = [mk(i, span) for i in range(20)]
    df_b = spark.createDataFrame(b, "doc_id: long, text: string")
    got_b = text.winnow_overlap_pairs(
        df_b, "text", "doc_id", min_shared=3
    ).collect()
    assert got_b == []


def test_novelty_neardup_gate(spark):
    """The near-dup novelty gate: a new doc that is a trivially-edited
    re-crawl of an existing doc is NOT novel; a genuinely new doc is;
    an exact-digest gate (q_novelty's rule) would pass the edited
    re-crawl straight through — the case this operator exists for."""
    base = ("the quick brown fox jumps over the lazy dog "
            "and then runs far away into the deep dark woods tonight")
    old = spark.createDataFrame(
        [(0, base), (2, "completely unrelated corpus text about ships " * 4)],
        "doc_id: long, text: string",
    )
    new = spark.createDataFrame(
        [
            (1, base.replace("tonight", "on tuesday")),  # edited re-crawl
            (3, "fresh reporting about volcanic rock formations " * 4),
        ],
        "doc_id: long, text: string",
    )
    novel = {
        r.doc_id
        for r in dedup.novelty_neardup(new, old, "text", "doc_id").collect()
    }
    assert novel == {3}
    # exact digest would have called BOTH novel
    from tmp_parquet_merge_spark.operators.dedup import normalize_text
    digests_old = {r[0] for r in old.select(F.md5(normalize_text("text"))).collect()}
    digests_new = {r[0]: r[1] for r in new.select("doc_id", F.md5(normalize_text("text"))).collect()}
    assert all(d not in digests_old for d in digests_new.values())


def test_doc_stitch_candidates(spark):
    """Stitch semantics pinned: a tail==head continuation pair is
    found with its bridge phrase; a doc shorter than 2m words never
    self-stitches; a bridge opening more than max_df docs is
    boilerplate and produces no pairs."""
    from tmp_parquet_merge_spark.operators import curation

    rows = [
        (1, "alpha beta gamma delta one two three"),
        (2, "one two three epsilon zeta eta theta"),  # continues doc 1
        (3, "totally unrelated words in this record here"),
        (4, "one two three"),  # 3 words < 2m: excluded entirely
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        (r.doc_a, r.doc_b): r.bridge
        for r in curation.doc_stitch_candidates(
            df, "text", "doc_id", m=3
        ).collect()
    }
    assert got == {(1, 2): "one two three"}
    # boilerplate bridge: the same head on MANY docs is dropped
    many = [(i, f"common start here unique{i} a b c") for i in range(10, 50)]
    many.append((99, "ends with the common start here"))
    df2 = spark.createDataFrame(many, "doc_id: long, text: string")
    got2 = curation.doc_stitch_candidates(
        df2, "text", "doc_id", m=3, max_df=16
    ).collect()
    assert got2 == []


def test_embedding_drift_detects_shift(spark):
    """Drift semantics pinned: a label whose odd-id (current) vectors
    are the even-id (reference) vectors ROTATED has centroid cosine
    well below 1; a label with identical distributions sits at 1."""
    import numpy as np

    rng = np.random.RandomState(5)
    rows = []
    base = rng.randn(8, 16).astype("float32")
    vid = 0
    for i in range(20):  # label 0: stable — SAME vector at both parities
        v = base[i % 8]
        rows.append((vid, [float(x) for x in v], 0)); vid += 1
        rows.append((vid, [float(x) for x in v], 0)); vid += 1
    for i in range(20):  # label 1: current (odd) = rolled reference
        v = base[i % 8]
        rows.append((vid, [float(x) for x in v], 1)); vid += 1
        rows.append((vid, [float(x) for x in np.roll(v, 5)], 1)); vid += 1
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>, label: int")
    got = {r.label: r for r in similarity.embedding_drift(df).collect()}
    assert got[0].centroid_cosine > 0.999
    assert got[1].centroid_cosine < 0.9
    assert got[0].n_ref == 20 and got[0].n_cur == 20


def test_winnowing_overlong_document_chunks_transparently(spark):
    """r12 verdict #4: a document past the old 2^20-char position
    field must now fingerprint via the transparent chunk composition
    instead of raise_error'ing.  The all-same-char pathological case
    makes the expected selection closed-form: every k-gram hashes
    identically, so each window selects its RIGHTMOST position —
    positions w..npos, one fingerprint per window, density → 1."""
    n = (1 << 20) + 64
    df = spark.createDataFrame(
        [(1, "x" * n)], "doc_id: long, text: string"
    )
    sel = text.winnowing_select(df, "text", "doc_id", k=8, w=8).collect()
    npos = n - 7
    assert {r.h for r in sel} == {sel[0].h}
    assert {r.pos for r in sel} == set(range(8, npos + 1))


def test_novelty_neardup_bands_guard():
    """The novelty gate inherits minhash's bands-divide guard: a
    non-dividing band count would silently drop signature lanes."""
    import pytest

    with pytest.raises(ValueError, match="evenly divide"):
        dedup.novelty_neardup(None, None, "text", "doc_id", bands=15)


def test_novelty_lsh_no_pairs_in_risky_jaccard_band():
    """r13 advisor (medium): q_novelty_lsh pairs a probabilistic
    16-band x 4-row MinHash candidate generator (~65% per-pair recall
    at jaccard exactly 0.5) with an EXACT all-pairs oracle, so
    equivalence is data-dependent.  This pins the margin the
    editdist-LSH precedent uses: on every bundled tier, no cross-side
    pair may fall in the risky band [0.5, 0.85) between the query
    threshold and the S-curve knee — every qualifying pair must sit at
    J >= 0.85, where per-pair miss probability is < 1e-6.  A future
    fixture regeneration that lands a pair in the band fails HERE, not
    in the round's one driver run."""
    import duckdb

    from tmp_parquet_merge_spark.queries_llm import _SH, _W

    for sf in ("0.001", "0.01", "0.1"):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'/root/testdata/sf{sf}/documents.parquet'"
        )
        js = [
            r[0]
            for r in con.execute(
                f"""
                WITH {_W}, {_SH},
                e0 AS (SELECT DISTINCT doc_id, unnest(shingles) AS g FROM sh),
                n AS (SELECT doc_id, COUNT(*) AS n FROM e0 GROUP BY 1),
                p AS (
                    SELECT b.doc_id AS doc_new, a.doc_id AS doc_old,
                           COUNT(*) AS i
                    FROM e0 b JOIN e0 a ON b.g = a.g
                    WHERE b.doc_id % 2 = 1 AND a.doc_id % 2 = 0
                    GROUP BY 1, 2
                )
                SELECT round(CAST(p.i AS DOUBLE) / (nn.n + no.n - p.i), 6)
                FROM p JOIN n nn ON nn.doc_id = p.doc_new
                       JOIN n no ON no.doc_id = p.doc_old
                WHERE round(CAST(p.i AS DOUBLE) / (nn.n + no.n - p.i), 6)
                      >= 0.5
                """
            ).fetchall()
        ]
        assert js, f"sf{sf}: corpus should contain cross-side near-dups"
        risky = [j for j in js if j < 0.85]
        assert not risky, f"sf{sf}: pairs in LSH risky band [0.5,0.85): {risky}"


def test_pad_waste_arithmetic(spark):
    """Closed-form fixture: L=64; a 10-token and a 70-token doc in one
    source -> naive pads 54 + 58; packed needs ceil(80/64)=2 seqs ->
    pad 48."""
    rows = [
        (0, " ".join(["w"] * 10), "s1"),
        (1, " ".join(["w"] * 70), "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    out = curation.pad_waste(df, "text", "source", context_len=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_docs, r.total_tokens, r.pad_naive) == (2, 80, 54 + 58)
    assert r.pad_packed == 2 * 64 - 80
    assert r.pad_rate_naive == round(112 / (80 + 112), 6)
    assert r.pad_rate_packed == round(48 / 128, 6)


def test_span_mask_plan_deterministic_and_non_overlapping(spark):
    """Spans sit one per equal block (non-overlapping by construction),
    inside the document, and the draw is a pure function of
    (doc_id, span_idx) — two runs, identical plans."""
    rows = [(i, " ".join(f"t{j}" for j in range(120))) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    a = {r.doc_id: r for r in curation.span_mask_plan(df, "text", "doc_id").collect()}
    b = {r.doc_id: r for r in curation.span_mask_plan(df, "text", "doc_id").collect()}
    for i in a:
        assert a[i] == b[i]
        r = a[i]
        assert r.n_spans == (120 * 15) // 300 == 6
        assert r.n_masked == 18
        starts = [int(s) for s in r.span_starts.split(",")]
        assert len(starts) == 6
        B = 120 // 6
        for k, s in enumerate(starts):
            # span k (0-based) must lie inside block k and fit 3 tokens
            assert k * B + 1 <= s <= (k + 1) * B - 2
        # non-overlapping and sorted by construction
        assert all(s2 - s1 >= 3 for s1, s2 in zip(starts, starts[1:]))
    # jitter differs across docs (md5 keyed by doc_id)
    assert len({a[i].span_starts for i in a}) > 1


def test_span_mask_plan_param_validation(spark):
    """r13 advisor: ratios implying blocks smaller than span_len (or
    non-positive parameters) are rejected loudly; the extreme VALID
    ratio (100%) still yields non-NULL in-bounds starts (jitter
    modulus >= 1 for every doc)."""
    import pytest as _pytest

    rows = [(i, " ".join(f"t{j}" for j in range(7 + 13 * i))) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    with _pytest.raises(ValueError, match="mask_ratio_pct"):
        curation.span_mask_plan(df, "text", "doc_id", mask_ratio_pct=101)
    with _pytest.raises(ValueError, match="mask_ratio_pct"):
        curation.span_mask_plan(df, "text", "doc_id", mask_ratio_pct=0)
    with _pytest.raises(ValueError, match="span_len"):
        curation.span_mask_plan(df, "text", "doc_id", span_len=0)
    out = curation.span_mask_plan(
        df, "text", "doc_id", mask_ratio_pct=100, span_len=3
    ).collect()
    for r in out:
        assert r.span_starts is not None
        if r.n_spans > 0:
            starts = [int(s) for s in r.span_starts.split(",")]
            assert len(starts) == r.n_spans
            B = r.n_tok // r.n_spans
            for k, s in enumerate(starts):
                assert k * B + 1 <= s <= k * B + (B - 3) + 1


def test_quality_gate_matrix_rules(spark):
    """Each rule fires on its crafted violator and nothing else."""
    rows = [
        (0, "the quick brown fox jumps over a lazy dog today", "s"),  # 10 distinct words: clean
        (1, "the cat and the dog and the bird and the fish sat", "s"),  # 'the'x4 of 12: top-word fires
        (2, "short words only", "s"),  # too_short + no stopword + top-word (5*1>3)
        (3, "spam spam spam spam spam the end of it all now", "s"),  # top-word share 5/11
        (4, " ".join(["nostopword"] * 15), "s"),  # no stopword + top share
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    out = curation.quality_gate_matrix(df, "text", "doc_id", "source").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_docs == 5
    assert r.n_too_short == 1  # doc 2
    assert r.n_too_long == 0
    assert r.n_no_stopword == 2  # docs 2 and 4
    assert r.n_top_word == 4  # docs 1, 2, 3, 4
    assert r.n_any_violation == 4  # doc 0 is the only clean one


def test_quality_gate_matrix_counts_zero_word_docs(spark):
    """r13 review finding: empty / whitespace-only documents — the
    worst-quality inputs the too-short gate exists for — must stay in
    the matrix (n_words = 0 fires too_short and no_stopword), not
    silently vanish from the per-source accounting."""
    rows = [
        (0, "the quick brown fox jumps over a lazy dog today", "s"),
        (1, "", "s"),
        (2, "   \t  ", "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    out = curation.quality_gate_matrix(df, "text", "doc_id", "source").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_docs == 3
    assert r.n_too_short == 2
    assert r.n_no_stopword == 2
    assert r.n_top_word == 0  # 5*0 > 0 is false for empty docs
    assert r.n_any_violation == 2


def test_benford_digit_extraction_integer_path(spark, sf_dir):
    """First-digit histogram covers 1-9, shares sum to 1, and the
    expected shares are the Benford values."""
    import math

    from tmp_parquet_merge_spark.queries import REGISTRY

    rows = REGISTRY["q_benford"].build(spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.benford_share == round(math.log10(1 + 1 / r.digit), 6)


def test_cluster_stats_rollup_consistency(spark, sf_dir):
    """The size histogram must roll up exactly from the cluster
    relation: sum(n_docs) = corpus size, sum over sizes of
    size*n_clusters = sum(n_docs)."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rows = REGISTRY["q_cluster_stats"].build(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == docs_n
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters


def test_cms_overestimate_one_sided(spark, sf_dir):
    """The count-min invariant: est >= exact for EVERY reported token
    (one-sided error), and the estimates are deterministic across
    builds."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    a = sorted(map(tuple, REGISTRY["q_heavy_hitters"].build(spark, sf_dir).collect()))
    b = sorted(map(tuple, REGISTRY["q_heavy_hitters"].build(spark, sf_dir).collect()))
    assert a == b and len(a) == 20
    for token, exact_cnt, cms_est, over in a:
        assert cms_est >= exact_cnt
        assert over == cms_est - exact_cnt


def test_cms_exact_on_sparse_fixture(spark):
    """With vocabulary << width the buckets rarely collide: every
    estimate equals its exact count on a tiny corpus."""
    rows = [(i, f"tok{i} tok{i} filler{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = text.cms_heavy_hitters(df, "text", "doc_id", top_k=10).collect()
    assert out and all(r.overestimate == 0 for r in out)


def test_bloom_novelty_no_false_negatives(spark, sf_dir):
    """Bloom's contract: every exact duplicate MUST be flagged
    maybe_seen (no false negatives); false_positive is exactly the
    maybe_seen - seen_exact gap; and the gate is deterministic."""
    from tmp_parquet_merge_spark.queries import REGISTRY

    rows = REGISTRY["q_bloom_novelty"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.seen_exact == 1:
            assert r.maybe_seen == 1, f"false negative at doc {r.doc_id}"
        assert r.false_positive == (1 if (r.maybe_seen and not r.seen_exact) else 0)


def test_bloom_novelty_planted_duplicate(spark):
    """A planted exact cross-side duplicate must flag maybe_seen=1 AND
    seen_exact=1; a unique doc must be seen_exact=0 (and, at m=2^14
    with 2 old docs, maybe_seen=0 — 3 specific bits colliding by
    chance is ~(6/16384)^3)."""
    rows = [
        (0, "the shared crawl page body"),      # old
        (2, "some other existing document"),    # old
        (1, "the shared crawl page body"),      # new: exact dup of 0
        (3, "a genuinely novel document here"), # new: novel
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {
        r.doc_id: r
        for r in dedup.bloom_novelty(
            df.filter(F.col("doc_id") % 2 == 1),
            df.filter(F.col("doc_id") % 2 == 0),
            "text",
            "doc_id",
        ).collect()
    }
    assert out[1].maybe_seen == 1 and out[1].seen_exact == 1
    assert out[3].seen_exact == 0 and out[3].maybe_seen == 0
    assert out[3].false_positive == 0


def test_containment_rare_shingle_equals_exact(spark, docs, sf_dir):
    """The rare-shingle-fed containment scale path must reproduce the
    exact all-pairs containment output on the bundled corpus (every
    qualifying pair shares a rare df<=16 shingle — measured zero
    missed at all tiers) — the q_dedup_cluster_lsh certification
    pattern for the one family MinHash banding cannot feed."""
    exact = dedup.ngram_containment_pairs(docs, "text", "doc_id", n=3, threshold=0.8)
    fed = dedup.containment_pairs_rare_shingle(
        docs, "text", "doc_id", n=3, threshold=0.8, max_df=16
    )
    e = sorted(map(tuple, exact.collect()))
    f = sorted(map(tuple, fed.collect()))
    assert e, "corpus should contain containment pairs"
    assert f == e
    # the registered query composes the same pipeline
    from tmp_parquet_merge_spark.queries import REGISTRY

    q = REGISTRY["q_dedup_containment_lsh"].build(spark, sf_dir)
    assert sorted(map(tuple, q.collect())) == e


def test_containment_rare_shingle_margin():
    """The min_shared=3 candidate cut rides a margin: on every bundled
    tier, every qualifying containment pair shares at least
    2*min_shared = 6 rare (2 <= df <= 16) shingles — a fixture
    regeneration that narrows the margin fails HERE, not in the
    round's one driver run (the novelty-LSH margin-pin pattern)."""
    import duckdb

    from tmp_parquet_merge_spark.queries_llm import _SH, _W

    for sf in ("0.001", "0.01", "0.1"):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'/root/testdata/sf{sf}/documents.parquet'"
        )
        mn, n_pairs = con.execute(
            f"""
            WITH {_W}, {_SH},
            e AS (SELECT DISTINCT doc_id, unnest(shingles) AS g FROM sh),
            n AS (SELECT doc_id, COUNT(*) AS n FROM e GROUP BY 1),
            dfq AS (SELECT g, COUNT(*) AS df FROM e GROUP BY 1),
            p AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       COUNT(*) AS i,
                       SUM(CASE WHEN dfq.df BETWEEN 2 AND 16
                           THEN 1 ELSE 0 END) AS rare_shared
                FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
                JOIN dfq ON dfq.g = a.g
                GROUP BY 1, 2
            )
            SELECT MIN(rare_shared), COUNT(*) FROM p
            JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
            WHERE round(CAST(i AS DOUBLE)/na.n, 6) >= 0.8
               OR round(CAST(i AS DOUBLE)/nb.n, 6) >= 0.8
            """
        ).fetchone()
        assert n_pairs, f"sf{sf}: corpus should contain containment pairs"
        assert mn >= 6, f"sf{sf}: margin narrowed to {mn} shared rare shingles"


def test_containment_short_doc_found(spark):
    """r13 review finding: a 4-word doc (2 shingles, below the
    min_shared=3 floor) fully contained in a larger page must still be
    found — the candidate cut relaxes to the smaller doc's shingle
    count.  The exact twin and the rare-shingle path must agree."""
    rows = [
        (0, "alpha beta gamma delta"),  # 2 shingles, contained in doc 1
        (1, "intro words here alpha beta gamma delta closing remark text"),
        (2, "alpha beta gamma delta"),  # second copy keeps df >= 2
        (3, "totally unrelated content about something else entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    exact = sorted(
        map(tuple, dedup.ngram_containment_pairs(df, "text", "doc_id").collect())
    )
    fed = sorted(
        map(
            tuple,
            dedup.containment_pairs_rare_shingle(df, "text", "doc_id").collect(),
        )
    )
    assert exact == fed
    assert any(p[:2] == (0, 1) for p in exact), "containment pair must exist"


def test_containment_short_doc_boilerplate_shingle_found(spark):
    """r13 advisor: the candidate floor must relax to the smaller
    doc's RARE (2 <= df <= max_df) shingle count, not its total
    shingle count.  Doc 0 has 3 shingles of which one ('alpha beta
    gamma') is boilerplate (df > max_df, absent from the index); a
    total-count floor of least(3, 3) = 3 can never be met by its 2
    indexable shingles, so the old spelling structurally missed the
    pair despite full containment."""
    rows = [
        # 5 words -> 3 shingles: 'alpha beta gamma' (boilerplate),
        # 'beta gamma delta', 'gamma delta echo' (rare, df=2: docs 0+1)
        (0, "alpha beta gamma delta echo"),
        (1, "alpha beta gamma delta echo foxtrot golf hotel india"),
    ]
    # 20 fillers carrying ONLY the 'alpha beta gamma' shingle of doc
    # 0's set -> its df = 22 > max_df = 16
    rows += [
        (10 + i, f"alpha beta gamma unique{i} filler{i} tail{i}")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    exact = {
        p[:2]
        for p in map(
            tuple, dedup.ngram_containment_pairs(df, "text", "doc_id").collect()
        )
    }
    fed = {
        p[:2]
        for p in map(
            tuple,
            dedup.containment_pairs_rare_shingle(df, "text", "doc_id").collect(),
        )
    }
    assert (0, 1) in exact, "containment pair must exist in the exact twin"
    assert (0, 1) in fed, (
        "rare-shingle path must find the short doc whose set includes a "
        "boilerplate shingle (the rare-count floor fix)"
    )


def test_simhash_bands_one_rejected(spark):
    """bands=1 (width 64) divides 64 but its key mask exceeds the
    signed LongType literal range — rejected with a diagnostic
    instead of failing at plan build (r13 advisor)."""
    import pytest as _pytest

    df = spark.createDataFrame([(0, "a b c")], "doc_id: long, text: string")
    with _pytest.raises(ValueError, match="divisor of 64"):
        dedup.simhash_dedup_pairs(df, "text", "doc_id", bands=1, max_hamming=2)


def test_bpe_train_matches_reference(spark):
    """Multi-round BPE training (r13 verdict #4) against a pure-Python
    Sennrich et al. reference: greedy left-to-right non-overlapping
    merge, (count DESC, pair ASC) tie-break.  The fixture forces the
    overlap case (runs of the same symbol), a multi-char merge in a
    later round, and a count tie."""
    import collections

    from bpe_reference import ref_bpe

    corpus = (
        ["aaaa aaa banana bandana"] * 3
        + ["ananas banana aaaa"] * 2
        + ["ba na na aaaa aaaa"]
    )

    wc = collections.Counter(w for line in corpus for w in line.split())
    expected, _ = ref_bpe(wc, 6)
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(corpus)], "doc_id: long, text: string"
    )
    got = [tuple(r) for r in text.bpe_train(df, "text", n_merges=6).collect()]
    assert got == expected
    # the fixture must actually exercise a multi-symbol merge (a rule
    # whose lhs or rhs is itself a merged symbol) — otherwise 6 rounds
    # degenerate into 6 independent char-pair picks
    assert any(len(l) > 1 or len(r) > 1 for _, l, r, _, _ in expected)


def test_bpe_apply_matches_reference(spark):
    """The APPLY half: per-source word/token sums under the corpus's
    own trained merges must match a pure-Python train+apply."""
    import collections

    from bpe_reference import ref_bpe

    docs = [
        (0, "aaaa banana aaa", "web"),
        (1, "bandana ananas", "web"),
        (2, "aaaa aaaa na na", "books"),
        (3, "banana", "books"),
    ]

    wc = collections.Counter(w for _, t_, _ in docs for w in t_.split())
    _, fitted = ref_bpe(wc, 4)
    want = {}
    for _, t_, src in docs:
        ws = t_.split()
        d = want.setdefault(src, [0, 0])
        d[0] += len(ws)
        d[1] += sum(len(fitted[w]) for w in ws)
    df = spark.createDataFrame(docs, "doc_id: long, text: string, source: string")
    got = {
        r.source: (r.n_words, r.n_tokens, r.fertility)
        for r in text.bpe_apply(df, "text", "source", n_merges=4).collect()
    }
    assert set(got) == set(want)
    for src, (nw, nt) in want.items():
        assert got[src] == (nw, nt, round(nt / nw, 6)), src
