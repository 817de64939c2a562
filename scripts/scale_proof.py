#!/usr/bin/env python
"""Empirical sub-quadratic scale proof for the dedup/similarity family
(VERDICT r3 #3): run q63 / q71 / q65 / q78 / q129 at sf0.1 and at a 10x
fixture, record wall time + output rows, assert the capped paths grow
~linearly (quadratic would be ~100x).

The 10x fixture is TEN DECORRELATED SHARDS of sf0.1, built so linear
growth is the mathematically correct outcome rather than an artifact:

- documents: shard k remaps every token w -> f"{w}k{k}" (a vocabulary
  bijection). Intra-shard shingle sets are isomorphic to the real
  corpus — identical df distribution, identical duplicate structure —
  while cross-shard shingle overlap is exactly zero. This mirrors
  Heaps'-law vocabulary growth in real corpora.
- embeddings: shard k applies one random orthogonal rotation Q_k to all
  vectors. Rotations preserve every intra-shard cosine bit-for-bit
  (pair structure per shard == real fixture) while cross-shard cosines
  concentrate near 0 in 64-d, far below every tau in use.

So each per-shard statistic is exactly the sf0.1 statistic, 10x over:
a bucketed/blocked/capped algorithm must scale time ~10x and output
rows ~10x; an all-pairs algorithm pays 100x. Results are printed as
JSON and summarized in BASELINE.md's round-4 section.

Usage: python scripts/scale_proof.py [--rebuild]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
N_SHARDS = 10  # 1 real + 9 remapped/rotated
QUERIES = ["q63_dedup_near", "q71_dedup_minhash_lsh", "q129_semdedup",
           "q263_perplexity_bigram", "q268_bpe_merges",
           "q277_token_stream_chunks", "q282_dsir_weights",
           "q284_corpus_manifest",
           # round 6: q214's gram-frequency screen moved to aggregate +
           # semi-join (hot-gram safety); the decorrelated shards keep
           # duplicated substrings per-shard, so spans must grow ~10x
           "q214_substring_spans",
           # (q263 was already in the suite; its row below re-measures
           # the r6 distinct-pair probe-shrink spelling. q159 gets a
           # CUSTOM row — run_inverted_index — because the generic
           # rows-ratio check mis-models an index under vocabulary-
           # bijection sharding: 10 disjoint vocabularies make every
           # token 10x rarer relative to the whole corpus, so the
           # corpus-relative stopword ceiling correctly admits ALL
           # shards' tokens and index rows grow with VOCABULARY (310x
           # over a 1-token base), not quadratically with data.)
           # round 7: the iterative family. q156 TextRank — the bijected
           # shards make the co-occurrence graph 10 disjoint isomorphic
           # components; per-iteration cost is edge-linear and the output
           # is the fixed top-K (rows ratio ~1 by design). q162 power
           # iteration — 3 fixed corpus passes, broadcast-v, output is
           # the 64 loadings at any scale.
           "q156_textrank", "q162_pca_power",
           # round 7 (second batch): connected components — bijected
           # shards preserve exact-duplicate structure, so q111's pair
           # graph is 10 isomorphic-ish per-shard graphs (40-char prefix
           # boundaries shift under token remapping; bounded drift) and
           # label propagation converges in the same diameter. The
           # decontamination family probes a CONSTANT benchmark (doc_id
           # < 20 lives in shard 0 only) against a 10x corpus — the
           # realistic shape: rows per corpus doc ~10x, eval side flat.
           "q111_dedup_groups", "q115_decontaminate",
           "q124_bloom_decontaminate", "q140_ngram_decontaminate",
           # (q142/q239's mutual-kNN graph + triangles get a CUSTOM
           # planted row — knn_triangle_kernel — because their
           # registered tau=0.30 sits INSIDE the 64-d random-cosine
           # band: at 10x pair counts the rotated fixture's noise
           # legitimately enters the tau-ball and the result is
           # quadratic by problem definition, exactly like q65/q78.
           # The kernel row runs the same GEMM->top-k->mutual->triangle
           # composition at PLANT_TAU, where structure defines the
           # answer: edges/triangles/wedges must each be ~10x.)
           ]
# Streaming family (VERDICT r4 #6): 10x decorrelated event/document
# shards (disjoint user ranges / disjoint vocabularies), so per-shard
# state is the sf0.1 state — bounded state must grow ~10x in peak rows,
# never more, and wall time ~linearly. Recorded per run from the
# stream's own progress telemetry (streaming.queries.LAST_STATE_METRICS).
STREAM_QUERIES = ["q101_stream_stream_join", "q137_stream_curation",
                  "q281_stream_chained_windows"]
# linear = 10x. Bound at 25x: generous for constant overheads + shared-box
# noise, far below the ~100x an uncapped quadratic path would pay.
MAX_RATIO = 25.0
N_PLANTED = 50    # near-dup pairs planted per shard for the kernel check
PLANT_TAU = 0.90  # far above the 64-d random-cosine noise floor (7.2 sigma)


def fixture_dir() -> str:
    from eclypsium_etl_spark.io import source_stamp

    stamp = source_stamp(f"{SF01}/documents.parquet")
    # v3: adds the 10x customer shards for the warehouse kernels
    # (q304 blocked Levenshtein / q305 cdc_apply — VERDICT r5 #6)
    # v4: adds the planted TRIAD shards for the graph kernels (round 7)
    return f"/tmp/eclypsium_etl_spark/scale10v4_{stamp}"


def build_fixture(out: str) -> None:
    """Build the 10x shards with pandas+numpy (driver-side is fine: the
    SOURCE is 5k docs / 2k vectors; the point of the exercise is query
    behavior at 10x, not generator throughput)."""
    import numpy as np
    import pandas as pd

    os.makedirs(out, exist_ok=True)
    docs = pd.read_parquet(f"{SF01}/documents.parquet")
    parts = [docs]
    for k in range(1, N_SHARDS):
        d = docs.copy()
        d["text"] = d["text"].map(
            lambda t, k=k: " ".join(f"{w}k{k}" for w in t.split(" "))
        )
        d["doc_id"] = d["doc_id"] + len(docs) * k
        d["n_chars"] = d["text"].str.len()
        parts.append(d)
    pd.concat(parts, ignore_index=True).to_parquet(
        f"{out}/documents.parquet", index=False
    )

    emb = pd.read_parquet(f"{SF01}/embeddings.parquet")
    dim = len(emb["embedding"].iloc[0])
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    eparts = [emb]
    rng = np.random.default_rng(42)
    for k in range(1, N_SHARDS):
        q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
        e = emb.copy()
        rot = mat @ q
        e["embedding"] = list(rot)
        e["vec_id"] = e["vec_id"] + len(emb) * k
        eparts.append(e)
    pd.concat(eparts, ignore_index=True).to_parquet(
        f"{out}/embeddings.parquet", index=False
    )

    # Kernel-check fixtures: the REAL fixture has no high-cosine structure
    # (sims top out ~0.5, below the 64-d noise ceiling at 10x pair counts),
    # so the embedding-family rows assertion uses IDENTICAL planted
    # structure per shard at both scales — N_PLANTED perturbed near-copies
    # (cos ~0.995) per shard, measured at PLANT_TAU far above noise.
    def planted_shard(base_mat: np.ndarray, id_off: int, seed: int) -> pd.DataFrame:
        r = np.random.default_rng(seed)
        per = base_mat[:N_PLANTED] + 0.05 * r.standard_normal(
            (N_PLANTED, dim)
        )
        per = per / np.linalg.norm(per, axis=1, keepdims=True)
        vecs = np.concatenate([base_mat, per])
        ids = np.concatenate(
            [np.arange(len(base_mat)), len(base_mat) + np.arange(N_PLANTED)]
        )
        return pd.DataFrame(
            {"vec_id": ids + id_off, "embedding": list(vecs)}
        )

    # events: shard k gets a DISJOINT user-id range (and fresh event ids)
    # with the ORIGINAL timestamps — per-user join/session/dedup state is
    # isomorphic to sf0.1 per shard, the watermark timeline is identical,
    # so bounded-state streaming must scale peak state rows ~10x and an
    # unbounded-state plan would blow past it.
    ev = pd.read_parquet(f"{SF01}/events.parquet")
    user_span = int(ev["user_id"].max()) + 1
    event_span = int(ev["event_id"].max()) + 1
    evparts = [ev]
    for k in range(1, N_SHARDS):
        e = ev.copy()
        e["user_id"] = e["user_id"] + user_span * k
        e["event_id"] = e["event_id"] + event_span * k
        evparts.append(e)
    pd.concat(evparts, ignore_index=True).to_parquet(
        f"{out}/events.parquet", index=False
    )

    # customer: shard k translates every DIGIT of c_name into a
    # per-shard DISJOINT alphabet (Latin Extended-A slice — a character
    # bijection). q304's blocking key is the name's 3-char suffix, which
    # lives in the digit region, so per-shard block-size distribution is
    # IDENTICAL to the real shard while cross-shard blocks never collide:
    # candidates and matches must grow exactly 10x, block sizes not at
    # all. The key span is a multiple of 30 so every %3/%5/%10 residue
    # class (dirty selection, typo position, delete wave) is preserved
    # per shard.
    cust = pd.read_parquet(f"{SF01}/customer.parquet")
    span = (int(cust["c_custkey"].max()) // 30 + 1) * 30
    cparts = [cust]
    for k in range(1, N_SHARDS):
        c = cust.copy()
        trans = str.maketrans(
            {str(d): chr(0x100 + (k - 1) * 10 + d) for d in range(10)}
        )
        c["c_name"] = c["c_name"].str.translate(trans)
        c["c_custkey"] = c["c_custkey"] + span * k
        cparts.append(c)
    pd.concat(cparts, ignore_index=True).to_parquet(
        f"{out}/customer.parquet", index=False
    )

    shard_n = len(mat) + N_PLANTED
    planted_shard(mat, 0, seed=1000).to_parquet(
        f"{out}/emb_planted_1x.parquet", index=False
    )
    big = []
    for k in range(N_SHARDS):
        q, _ = np.linalg.qr(
            np.random.default_rng(500 + k).standard_normal((dim, dim))
        )
        big.append(planted_shard(mat @ q if k else mat, k * shard_n, seed=1000 + k))
    pd.concat(big, ignore_index=True).to_parquet(
        f"{out}/emb_planted_10x.parquet", index=False
    )

    # TRIAD shards for the graph kernels (q142/q239 class): N_PLANTED
    # bases each get TWO perturbed near-copies. sigma=0.02 on unit-norm
    # 64-d bases gives cos(base, copy) ~0.987 and cos(copy, copy) ~0.975
    # — both above PLANT_TAU with margin, while base-base sims (~0.5 max)
    # and cross-shard rotated sims (<6.5 sigma of the 1/8-sd noise band)
    # stay far below. Expected graph per shard: 3 mutual edges, 1
    # triangle, 3 wedges per triad — so edges/triangles/wedges must all
    # scale exactly 10x, and a non-blocked all-pairs path pays 100x time.
    def triad_shard(base_mat: np.ndarray, id_off: int, seed: int) -> pd.DataFrame:
        r = np.random.default_rng(seed)
        copies = []
        for _ in range(2):
            c = base_mat[:N_PLANTED] + 0.02 * r.standard_normal(
                (N_PLANTED, dim)
            )
            copies.append(c / np.linalg.norm(c, axis=1, keepdims=True))
        vecs = np.concatenate([base_mat] + copies)
        ids = np.arange(len(vecs))
        return pd.DataFrame({"vec_id": ids + id_off, "embedding": list(vecs)})

    triad_n = len(mat) + 2 * N_PLANTED
    triad_shard(mat, 0, seed=2000).to_parquet(
        f"{out}/emb_triads_1x.parquet", index=False
    )
    tbig = []
    for k in range(N_SHARDS):
        q, _ = np.linalg.qr(
            np.random.default_rng(700 + k).standard_normal((dim, dim))
        )
        tbig.append(triad_shard(mat @ q if k else mat, k * triad_n, seed=2000 + k))
    pd.concat(tbig, ignore_index=True).to_parquet(
        f"{out}/emb_triads_10x.parquet", index=False
    )
    open(f"{out}/_BUILT", "w").close()


def run_suite(spark, sf_dir: str) -> dict[str, dict]:
    from eclypsium_etl_spark.registry import load_all

    q, _ = load_all()
    res = {}
    for name in QUERIES:
        # time CONSTRUCTION + write, not write alone: fixpoint queries
        # (q111's label propagation, kmeans-family) materialize their
        # iterations eagerly inside the query function, so a write-only
        # timer reads ~0s for them at any scale (caught on q111's first
        # row). For lazy queries the construction add-on is plan-build
        # time — scale-independent, harmless to the ratio.
        t0 = time.perf_counter()
        df = q[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        res[name] = {"sec": round(wall, 2), "rows": q[name](spark, sf_dir).count()}
    return res


def run_streaming(spark, sf_dir: str) -> dict[str, dict]:
    """Run the streaming family end-to-end (the query fn drains the
    availableNow replay internally); record wall time, result rows, and
    the stream's own state-store telemetry (peak rows/bytes across
    micro-batches) captured by run_available_now.

    Telemetry attribution (ADVICE r5): LAST_STATE_METRICS is cleared
    BEFORE each query, so a previous query's entry can never be
    misattributed when _record_state_metrics bails; a query that drains
    with no telemetry reports state_rows=None and FAILS the bounded-state
    check in main() instead of passing vacuously."""
    from eclypsium_etl_spark.registry import load_all
    from eclypsium_etl_spark.streaming import queries as sq

    q, _ = load_all()
    res = {}
    for name in STREAM_QUERIES:
        sq.LAST_STATE_METRICS.clear()
        t0 = time.perf_counter()
        n = q[name](spark, sf_dir).count()
        wall = time.perf_counter() - t0
        vals = list(sq.LAST_STATE_METRICS.values())
        state = vals[-1] if vals else None
        res[name] = {
            "sec": round(wall, 2),
            "rows": n,
            "state_rows": state.get("peak_state_rows") if state else None,
            "state_bytes": state.get("peak_state_bytes") if state else None,
        }
    return res


def run_er(spark, customer_path: str) -> dict:
    """q304's blocked-Levenshtein kernel at scale (VERDICT r5 #6):
    rebuild the q304 shape (clean master = all customers, dirty = every
    third with one prefix char dropped) over an arbitrary customer
    parquet and measure what the blocking actually does — block-size
    distribution of the master side (suffix key), distinct candidate
    pairs produced by the kernel's FULL default pass union (suffix +
    the taildel deletion-neighborhood pass,
    ops.blocked_levenshtein_match's default block_passes; the
    end-anchored suffix2 alignment-window design was measured and
    rejected — what the kernel actually scores), matches, wall time.
    With the 10x decorrelated
    shards the expected outcome is: blocks 10x MORE but none BIGGER
    (max_block ratio ~1), candidates and matches exactly 10x, time
    ~linear — a quadratic fuzzy join would pay 100x in candidates (the
    rejected suffix+prefix union measurably DID: the constant 'Cus'
    prefix block alone is the full dirty x clean cross product, ~75M
    pairs at sf0.1)."""
    from pyspark.sql import functions as F

    from eclypsium_etl_spark import ops
    from eclypsium_etl_spark.operators.breadth import _ER_TYPO_SQL

    c = spark.read.parquet(customer_path).select("c_custkey", "c_name")
    clean = c.select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    typo = F.expr(
        _ER_TYPO_SQL.format(name="c_name", key="c_custkey")
        .replace("substr", "substring")
        .replace("strlen", "length")
    )
    dirty = c.filter(F.col("c_custkey") % 3 == 0).select(
        (F.col("c_custkey") + 10_000_000).alias("id"), typo.alias("name")
    )
    # block = the kernel's key: 3-char name suffix (ops.py contract)
    blocks = (
        clean.groupBy(F.substring("name", -3, 3).alias("b"))
        .count()
        .agg(
            F.count("*").alias("n_blocks"),
            F.max("count").alias("max_block"),
            F.round(F.avg("count"), 1).alias("mean_block"),
        )
        .collect()[0]
    )
    # the kernel's real candidate set: pair-deduped union over the
    # default pass list (suffix + taildel deletion-neighborhood)
    cand_n = ops.blocked_candidate_pairs(
        dirty, clean, max_len_diff=2, block_chars=3
    ).count()
    t0 = time.perf_counter()
    matches = ops.blocked_levenshtein_match(
        dirty, clean, max_len_diff=2, max_dist=2, block_chars=3
    ).count()
    wall = time.perf_counter() - t0
    return {
        "sec": round(wall, 2),
        "rows": matches,
        "candidates": cand_n,
        "n_blocks": int(blocks["n_blocks"]),
        "max_block": int(blocks["max_block"]),
        "mean_block": float(blocks["mean_block"]),
    }


def run_inverted_index(spark, sf_dir: str) -> dict:
    """q159's custom row (VERDICT r6 #6): the round-6 fix moved the
    df-band screen BEFORE collect_list so a Zipf-hot token's
    corpus-sized posting buffer is never built. The empirical claims
    that fix makes are (a) wall time ~linear in corpus size with the
    hot tokens present (every fixture token above the ceiling IS a hot
    token, ~10x more instances at 10x), and (b) every posting list
    actually collected is bounded by the stopword ceiling — max
    surviving df <= ceiling — at BOTH scales. Index ROW count is
    reported but not ratio-bounded: under vocabulary-bijection
    sharding it grows with vocabulary by design (see QUERIES note)."""
    from pyspark.sql import functions as F

    from eclypsium_etl_spark.registry import load_all

    q, _ = load_all()
    fn = q["q159_inverted_index"]
    df = fn(spark, sf_dir)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    stats = (
        fn(spark, sf_dir)
        .agg(F.count("*").alias("rows"), F.max("df").alias("max_df"))
        .collect()[0]
    )
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    ceiling = int(0.10 * n_docs)
    return {
        "sec": round(wall, 2),
        "rows": int(stats["rows"]),
        "max_collected_df": int(stats["max_df"]) if stats["max_df"] is not None else 0,
        "df_ceiling": ceiling,
        "cap_ok": (stats["max_df"] or 0) <= ceiling,
    }


def run_cdc(spark, n_waves: int) -> dict:
    """q305's cdc_apply kernel with a changelog ``n_waves`` update waves
    long over the SAME key space (VERDICT r5 #6): insert wave, then
    n_waves full-table update waves at increasing seq, then the delete
    wave. Current-state output must be IDENTICAL in row count at any
    log length (same keys, same survivors — that's the invariant a
    changelog-length-sensitive plan would break) and wall time ~linear
    in log length; per-key window state is n_waves+2 versions, never
    materialized beyond the key-hash shuffle."""
    from functools import reduce

    from pyspark.sql import DataFrame as SDF
    from pyspark.sql import functions as F

    from eclypsium_etl_spark import ops

    c = spark.read.parquet(f"{SF01}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    ins = c.select(
        F.col("c_custkey").alias("k"),
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    )
    waves = [
        c.select(
            F.col("c_custkey").alias("k"),
            F.lit(2 + j).alias("seq"),
            F.lit("U").alias("op"),
            F.col("c_name").alias("name"),
            F.round(F.col("c_acctbal") + F.lit(float(j + 1)), 2).alias("bal"),
        )
        for j in range(n_waves)
    ]
    dele = c.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("k"),
        F.lit(2 + n_waves).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("double").alias("bal"),
    )
    log = reduce(SDF.unionByName, [ins, *waves, dele])
    log_rows = log.count()
    t0 = time.perf_counter()
    n = ops.cdc_apply(log, ["k"], seq_col="seq", op_col="op").count()
    wall = time.perf_counter() - t0
    return {"sec": round(wall, 2), "rows": n, "log_rows": log_rows}


def planted_pairs(spark, emb_path: str) -> dict:
    """q65/q78's two-phase kernel (block-grid GEMM candidates + exact
    fold re-score) at PLANT_TAU on a planted fixture — the embedding
    family's rows-growth measurement. The registered q65/q78 run at
    tau=0.30, which is INSIDE the 64-d random-cosine band (sigma=1/8):
    their result set is quadratic by problem definition on this fixture,
    so the structural check runs where structure, not noise, defines the
    answer."""
    from pyspark.sql import functions as F

    from eclypsium_etl_spark.functions import dot
    from eclypsium_etl_spark.llm.similarity import grid_gemm_candidates

    em = spark.read.parquet(emb_path).select("vec_id", "embedding")
    cand = grid_gemm_candidates(em, PLANT_TAU)
    a = em.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = em.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    pairs = (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .filter(F.round(dot(F.col("emb_a"), F.col("emb_b")), 6) >= PLANT_TAU)
    )
    t0 = time.perf_counter()
    n = pairs.count()
    return {"sec": round(time.perf_counter() - t0, 2), "rows": n}


def _hom_customers(spark, n: int):
    """Homogeneous-growth synthetic: n sequential TPC-H-style names over
    the SAME digit alphabet (the real growth axis, vs the decorrelated
    shards' disjoint alphabets), dirty = every third with the standard
    typo expression."""
    from pyspark.sql import functions as F

    from eclypsium_etl_spark.operators.breadth import _ER_TYPO_SQL

    c = spark.range(1, n + 1).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
    )
    clean = c.select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    typo = F.expr(
        _ER_TYPO_SQL.format(name="c_name", key="c_custkey")
        .replace("substr", "substring")
        .replace("strlen", "length")
    )
    dirty = c.filter(F.col("c_custkey") % 3 == 0).select(
        (F.col("c_custkey") + 10_000_000).alias("id"), typo.alias("name")
    )
    return dirty, clean


def run_er_entropy(spark) -> dict:
    """The blocking-key ENTROPY ceiling, measured on HOMOGENEOUS growth —
    the axis the decorrelated shards structurally cannot see. The 10x
    customer shards translate digits into per-shard disjoint alphabets,
    so suffix blocks MULTIPLY; but real growth appends more rows over the
    SAME alphabet, and a k-char digit suffix has at most 10^k keys: once
    n >> 10^k, block size grows ~n/10^k and candidates ~n^2/10^k —
    quadratic with a small constant, invisible at fixture scale.

    Demonstrated: sequential TPC-H-style names at n and 4n with
    block_chars=3 (1,000-key ceiling -> candidates ~16x at 4x rows) vs
    block_chars=5 (100,000 keys -> candidates ~4x, linear). The remedy is
    the kernel's existing knob: block_chars must scale ~log_alphabet(n),
    and the completeness contract (names longer than 3*block_chars) still
    holds at 18-char names for block_chars=5. Matches must be IDENTICAL
    across block_chars at both scales — recall is completeness-protected,
    only the candidate budget changes."""
    from eclypsium_etl_spark import ops

    out: dict = {}
    for n in (15_000, 60_000):
        dirty, clean = _hom_customers(spark, n)
        row: dict = {}
        for bc in (3, 5):
            cand = ops.blocked_candidate_pairs(
                dirty, clean, max_len_diff=2, block_chars=bc
            ).count()
            t0 = time.perf_counter()
            matches = ops.blocked_levenshtein_match(
                dirty, clean, max_len_diff=2, max_dist=2, block_chars=bc
            ).count()
            row[f"bc{bc}"] = {
                "candidates": cand,
                "matches": matches,
                "sec": round(time.perf_counter() - t0, 2),
            }
        out[f"n{n}"] = row
    return out


def run_er_ladder(spark) -> dict:
    """Multi-decade homogeneous ladder (env-gated: SPARK_GRAFT_ER_LADDER=1
    — ~a minute of extra wall, off in the default suite): 15k -> 960k
    sequential names (64x) at block_chars=5, the right-sized key for this
    range (100k-key domain). Asserted invariants at every rung: every
    dirty row resolves (matches == n_dirty — single-edit completeness is
    scale-independent) and candidates stay linear-bounded
    (candidates/n under a generous constant). The top rung also records
    block_chars=6 to show the knob at the saturation edge."""
    from eclypsium_etl_spark import ops

    out: dict = {}
    for n in (15_000, 60_000, 240_000, 960_000):
        dirty, clean = _hom_customers(spark, n)
        bcs = (5, 6) if n == 960_000 else (5,)
        row: dict = {"n_dirty": n // 3}
        for bc in bcs:
            cand = ops.blocked_candidate_pairs(
                dirty, clean, max_len_diff=2, block_chars=bc
            ).count()
            t0 = time.perf_counter()
            matches = ops.blocked_levenshtein_match(
                dirty, clean, max_len_diff=2, max_dist=2, block_chars=bc
            ).count()
            row[f"bc{bc}"] = {
                "candidates": cand,
                "cand_per_row": round(cand / n, 1),
                "matches": matches,
                "sec": round(time.perf_counter() - t0, 2),
            }
        out[f"n{n}"] = row
    return out


def run_salt_growth(spark) -> dict:
    """q84's fixed-salt kernel on HOMOGENEOUS growth (VERDICT r7 #3) —
    the second axis the decorrelated shards can't see, applied to
    salting: the 10x customer shards bring 10x NEW keys, so per-key load
    never grows and n_salts=8 always looks sufficient; real growth adds
    rows to the SAME hot key, and a fixed salt count caps the hot key's
    parallelism at n_salts forever — per-reducer load grows ~hot/n_salts,
    linear in corpus size. Measured: a synthetic skewed fact table (user
    0 holds 10% of rows, fixed 1,001-user domain) at n and 4n, salted
    join at n_salts=8 (the registered q84 constant) vs 32. The recorded
    ceiling: max per-(key,salt) task load grows ~4x at fixed 8; the
    asserted remedy: at 4n, n_salts=32 restores per-task load to the
    n/8 baseline (ratio <= 2) with IDENTICAL join output rows (salting
    never changes semantics — q84's oracle contract). Sizing rule, now
    measured: n_salts ~= hot_key_rows / target_task_rows — scale the
    SALT count with the hot key, exactly as block_chars scales with
    corpus entropy (run_er_entropy)."""
    from pyspark.sql import functions as F

    from eclypsium_etl_spark import ops

    def fact_of(n: int):
        return spark.range(n).select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") % 10 == 0, 0)
            .otherwise(F.col("id") % 1000 + 1)
            .alias("user_id"),
            (F.col("id") % 997).cast("double").alias("value"),
        )

    out: dict = {}
    for n in (400_000, 1_600_000):
        fact = fact_of(n)
        dim = fact.groupBy("user_id").agg(F.count("*").alias("user_n"))
        row: dict = {"rows": n, "hot_rows": n // 10}
        for s in (8, 32):
            t0 = time.perf_counter()
            joined = ops.salted_join(
                fact, dim, "user_id", salt_from="event_id", n_salts=s
            ).count()
            wall = time.perf_counter() - t0
            max_task = (
                fact.withColumn(
                    "__salt", F.pmod(F.hash("event_id"), F.lit(s))
                )
                .groupBy("user_id", "__salt")
                .count()
                .agg(F.max("count"))
                .collect()[0][0]
            )
            row[f"salts{s}"] = {
                "sec": round(wall, 2),
                "joined_rows": joined,
                "max_task_rows": int(max_task),
            }
        out[f"n{n}"] = row
    return out


def run_bucket_growth(spark) -> dict:
    """q161's fixed-bucket layout on HOMOGENEOUS growth (VERDICT r7 #3):
    the decorrelated 10x shards would add 10x new customers — more
    buckets' WORTH of keys hashed over the same 8 buckets, every bucket
    growing uniformly, which still 'works' at fixture scale. The honest
    axis is the same customer base accumulating 4x the orders: a fixed
    num_buckets caps the shuffle-free join's parallelism at 8 tasks
    forever and per-bucket bytes grow linearly — the layout analog of
    the blocking-key entropy ceiling. Measured: orders-like facts over a
    fixed 50,000-customer domain at n and 4n, bucketed at 8 (the
    registered q161 constant) vs 32 at the bigger scale. Recorded
    ceiling: per-bucket rows ~4x at fixed 8. Asserted remedy: 32 buckets
    at 4n restores per-bucket rows to the n/8 baseline (ratio <= 2) and
    the join stays ZERO-exchange at EVERY rung (co-location is
    num_buckets-independent as long as both sides agree — re-bucketing
    is a rewrite of the layout, not of the query). Sizing rule:
    num_buckets ~= table_bytes / target_bucket_bytes, fixed at write
    time — which is why production bucket counts are chosen for the
    table's TARGET size, then the table is re-bucketed (one rewrite)
    when it outgrows them."""
    from pyspark.sql import functions as F

    from eclypsium_etl_spark import plans
    from eclypsium_etl_spark.io import write_bucketed

    def fact_of(n: int):
        return spark.range(n).select(
            F.col("id").alias("o_orderkey"),
            (F.col("id") % 50_000).alias("o_custkey"),
            (F.col("id") % 9973).cast("double").alias("o_totalprice"),
        )

    dim = spark.range(50_000).select(
        F.col("id").alias("o_custkey"),
        F.concat(F.lit("seg"), (F.col("id") % 5).cast("string")).alias(
            "c_mktsegment"
        ),
    )
    out: dict = {}
    for n, bucket_counts in ((250_000, (8,)), (1_000_000, (8, 32))):
        row: dict = {"rows": n}
        for b in bucket_counts:
            ot, ct = f"hom_orders_{n}_{b}", f"hom_cust_{n}_{b}"
            write_bucketed(fact_of(n), ot, "o_custkey", b, sort_col="o_custkey")
            write_bucketed(dim, ct, "o_custkey", b, sort_col="o_custkey")
            j = (
                spark.table(ot)
                .hint("merge")
                .join(spark.table(ct), "o_custkey")
            )
            n_exchanges = plans.shuffle_count(j)
            t0 = time.perf_counter()
            joined = j.count()
            wall = time.perf_counter() - t0
            per_bucket = (
                spark.table(ot)
                .groupBy(F.pmod(F.hash("o_custkey"), F.lit(b)).alias("bk"))
                .count()
                .agg(F.max("count"))
                .collect()[0][0]
            )
            row[f"buckets{b}"] = {
                "sec": round(wall, 2),
                "joined_rows": joined,
                "join_exchanges": n_exchanges,
                "max_bucket_rows": int(per_bucket),
            }
            for t in (ot, ct):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
        out[f"n{n}"] = row
    return out


def run_posting_segments(spark, sf_dir: str) -> dict:
    """q318's custom row: the segmented index's absolute bound — max
    per-segment posting length (seg_df) can never exceed the segment
    width regardless of how hot the token is or how big the corpus
    grows; that cap is the asserted invariant at both scales. The hot
    token's SEGMENT COUNT (the fan-out that replaces q159's
    corpus-fraction-sized buffers) is recorded, with the same caveat
    run_er_entropy exists for: under the 10x fixture's
    vocabulary-bijection sharding a token stays inside its own shard's
    doc range, so fan-out reads FLAT here (~n_shard_docs/width) and
    admitted tokens grow with vocabulary instead — homogeneous growth
    is the axis where fan-out grows ~linearly, and the per-segment cap
    is what holds under EITHER axis (it is doc-range-local by
    construction, blind to both)."""
    from pyspark.sql import functions as F

    from eclypsium_etl_spark.llm.text import _SEG_DOCS
    from eclypsium_etl_spark.registry import load_all

    q, _ = load_all()
    df = q["q318_posting_segments"](spark, sf_dir)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    stats = (
        q["q318_posting_segments"](spark, sf_dir)
        .groupBy("token")
        .agg(
            F.max("seg_df").alias("max_seg_df"),
            F.count("*").alias("n_segs"),
        )
        .agg(
            F.count("*").alias("tokens"),
            F.max("max_seg_df").alias("max_seg_df"),
            F.max("n_segs").alias("max_token_segments"),
        )
        .collect()[0]
    )
    return {
        "sec": round(wall, 2),
        "tokens": int(stats["tokens"]),
        "max_seg_df": int(stats["max_seg_df"]) if stats["max_seg_df"] else 0,
        "max_token_segments": int(stats["max_token_segments"] or 0),
        "seg_width": _SEG_DOCS,
        "cap_ok": (stats["max_seg_df"] or 0) <= _SEG_DOCS,
    }


def knn_triangle_kernel(spark, emb_path: str) -> dict:
    """q142's mutual-kNN graph + q239's triangle/wedge counting, run as
    one composition at PLANT_TAU on the planted TRIAD fixture — the
    graph family's structural scale row. Same code path as the queries
    (grid_gemm_candidates tau-ball -> exact JVM dot re-score -> per-src
    top-k window -> mutual self-join -> a<b<c triangle joins); only the
    threshold differs, because the registered tau=0.30 is inside the
    64-d noise band where a 10x fixture's answer is quadratic by
    problem definition (see the q65/q78 note on planted_pairs)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from eclypsium_etl_spark.functions import dot
    from eclypsium_etl_spark.llm.similarity import grid_gemm_candidates

    em = spark.read.parquet(emb_path).select("vec_id", "embedding")
    cand = grid_gemm_candidates(em, PLANT_TAU)
    cand = cand.union(
        cand.select(F.col("vec_b").alias("vec_a"), F.col("vec_a").alias("vec_b"))
    )
    a = em.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = em.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    w = Window.partitionBy("src").orderBy(F.desc("s"), F.asc("dst"))
    edges = (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select(
            F.col("vec_a").alias("src"),
            F.col("vec_b").alias("dst"),
            dot(F.col("emb_a"), F.col("emb_b")).alias("s"),
        )
        .filter(F.round("s", 6) >= PLANT_TAU)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("src", "dst")
    )
    e, m = edges.alias("e"), edges.alias("m")
    und = (
        e.join(
            m,
            (F.col("m.src") == F.col("e.dst"))
            & (F.col("m.dst") == F.col("e.src")),
        )
        .where(F.col("e.src") < F.col("e.dst"))
        .select(F.col("e.src").alias("a"), F.col("e.dst").alias("b"))
    )
    t0 = time.perf_counter()
    n_edges = und.count()
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    n_tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .count()
    )
    nbr = und.select(F.col("a").alias("center"), F.col("b").alias("leaf")).union(
        und.select(F.col("b").alias("center"), F.col("a").alias("leaf"))
    )
    n1, n2 = nbr.alias("n1"), nbr.alias("n2")
    n_wedges = n1.join(
        n2,
        (F.col("n2.center") == F.col("n1.center"))
        & (F.col("n1.leaf") < F.col("n2.leaf")),
    ).count()
    return {
        "sec": round(time.perf_counter() - t0, 2),
        "edges": n_edges,
        "triangles": n_tri,
        "wedges": n_wedges,
    }



def _build_ivf_planted(out: str, n: int, seed: int = 7) -> None:
    """Planted-CLUSTER embedding fixture (VERDICT r8 #3): every recall
    number in the registered IVF family rides the decorrelated noise
    fixture, where k-means cells come out balanced — real embedding
    corpora are CLUSTERED, so cells skew and the per-cell work
    concentrates exactly where the data is densest. This generator
    plants 8 clusters with Zipf-skewed sizes (the hot cluster holds 50%
    of the corpus) around orthonormal 64-d directions, sigma=0.35
    Gaussian spread, unit-normalized float32 — plus 24 held-out queries
    (16 perturbed from the HOT cluster, 8 from the SMALLEST) so
    hot-vs-cold search cost is measured separately. vec_ids are a
    seeded permutation so the engine's first-k Lloyd init is spread
    across clusters, not hostage to generation order."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    d, c = 64, 8
    centers = np.linalg.qr(rng.standard_normal((d, c)))[0].T
    shares = np.array([0.50, 0.20, 0.10, 0.07, 0.05, 0.04, 0.02, 0.02])
    sizes = (shares * n).astype(int)
    sizes[0] += n - sizes.sum()
    pts, labs = [], []
    for i, m in enumerate(sizes):
        x = centers[i] + 0.35 * rng.standard_normal((m, d))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        pts.append(x)
        labs.append(np.full(m, i))
    x = np.vstack(pts).astype(np.float32)
    lab = np.concatenate(labs)
    perm = rng.permutation(n)
    x, lab = x[perm], lab[perm]
    pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(x),
            "planted": lab.astype(np.int64),
        }
    ).to_parquet(out, index=False)
    # queries: 16 hot-cluster + 8 smallest-cluster perturbations
    qrows = []
    for qi in range(24):
        src = 0 if qi < 16 else c - 1
        v = centers[src] + 0.35 * rng.standard_normal(d)
        v /= np.linalg.norm(v)
        qrows.append((qi, v.astype(np.float32), src))
    pd.DataFrame(
        {
            "query_id": [r[0] for r in qrows],
            "embedding": [r[1] for r in qrows],
            "planted": [r[2] for r in qrows],
        }
    ).to_parquet(out.replace(".parquet", "_q.parquet"), index=False)


def run_ivf_skew(spark) -> dict:
    """Skew-axis proof for the trained-IVF family (VERDICT r8 #3): on a
    planted-cluster corpus at two scales (n, 4n), measure per cell-count
    knob k: max-cell occupancy SHARE, per-query candidate counts for
    hot-cluster vs cold-cluster queries (single probe — candidates = the
    probed cell's population, the per-cell cost that degrades where data
    is densest), and recall@3 vs exact brute force. The saturation axis:
    at FIXED k=8 the hot cell tracks the planted 50% share, so hot-query
    candidates grow ~4x with 4x rows (half the corpus per probe —
    per-cell quadratics like q129's within-cell dedup grow 16x there);
    the knob is k itself — Lloyd allocates centroids toward density, so
    k=64 fragments the hot cluster and restores per-probe candidates.
    This mirrors run_salt_growth/run_bucket_growth: fixed-knob ratios
    are RECORDED ceilings, the knob row proves the remedy."""
    from pyspark.sql import Window, functions as F

    from eclypsium_etl_spark.functions import dot
    from eclypsium_etl_spark.llm.clustering import (
        assign_to_centroids,
        kmeans_fit,
    )

    out = fixture_dir()
    res = {}
    for n in (20_000, 80_000):
        path = f"{out}/ivf_planted_{n}.parquet"
        if not os.path.exists(path):
            _build_ivf_planted(path, n)
        em = spark.read.parquet(path).select("vec_id", "embedding")
        qs = spark.read.parquet(path.replace(".parquet", "_q.parquet"))
        # exact brute-force top-3 per query (the recall denominator)
        w = Window.partitionBy("query_id").orderBy(
            F.desc("sim"), F.asc("vec_id")
        )
        exact3 = (
            qs.select("query_id", F.col("embedding").alias("q_emb"))
            .crossJoin(em)
            .select(
                "query_id",
                "vec_id",
                dot(F.col("q_emb"), F.col("embedding")).alias("sim"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("query_id", "vec_id")
        )
        exact3.cache()
        exact3.count()
        row = {"rows": n}
        for k, probes in ((8, (1,)), (64, (1, 4))):
            t0 = time.perf_counter()
            _, cents_lazy = kmeans_fit(
                spark, None, k=k, iterations=3, source=em
            )
            # pin the trained model (k x dim floats) so downstream
            # actions don't re-run the Lloyd chain per reference — the
            # engine's own driver-side model-state discipline
            cents = spark.createDataFrame(
                [(r["cent_id"], r["cent_emb"]) for r in cents_lazy.collect()],
                "cent_id bigint, cent_emb array<float>",
            )
            asg = assign_to_centroids(em, cents).select("vec_id", "cent_id")
            cell_counts = {
                r["cent_id"]: r["cnt"]
                for r in asg.groupBy("cent_id")
                .agg(F.count("*").alias("cnt"))
                .collect()
            }
            train_sec = round(time.perf_counter() - t0, 1)
            max_cell = max(cell_counts.values())
            # nprobe-cell search: rank cells per query, rerank inside the
            # probed union — nprobe>1 for the big k proves recall is
            # RECOVERABLE once the two knobs move together
            w_cell = Window.partitionBy("query_id").orderBy(
                F.desc("c_sim"), F.asc("cent_id")
            )
            ranked_cells = (
                qs.select(
                    "query_id",
                    F.col("embedding").alias("q_emb"),
                    "planted",
                )
                .crossJoin(F.broadcast(cents))
                .select(
                    "query_id",
                    "q_emb",
                    "planted",
                    "cent_id",
                    dot(F.col("q_emb"), F.col("cent_emb")).alias("c_sim"),
                )
                .withColumn("cell_rn", F.row_number().over(w_cell))
            )
            for nprobe in probes:
                t1 = time.perf_counter()
                probed = ranked_cells.filter(
                    F.col("cell_rn") <= nprobe
                ).select("query_id", "q_emb", "planted", "cent_id")
                cand = probed.join(asg, "cent_id").join(em, "vec_id")
                ivf3 = (
                    cand.select(
                        "query_id",
                        "planted",
                        "vec_id",
                        dot(F.col("q_emb"), F.col("embedding")).alias("sim"),
                    )
                    .withColumn("rn", F.row_number().over(w))
                    .filter(F.col("rn") <= 3)
                )
                hits = (
                    ivf3.join(exact3, ["query_id", "vec_id"], "semi")
                    .groupBy()
                    .count()
                    .collect()[0][0]
                )
                search_sec = round(time.perf_counter() - t1, 1)
                qc = [
                    (r["planted"], cell_counts[r["cent_id"]])
                    for r in probed.select(
                        "query_id", "planted", "cent_id"
                    ).collect()
                ]
                hot = [c for pl, c in qc if pl == 0]
                cold = [c for pl, c in qc if pl != 0]
                row[f"k{k}_p{nprobe}"] = {
                    "max_cell_rows": max_cell,
                    "max_cell_share": round(max_cell / n, 3),
                    "hot_query_candidates_mean": round(sum(hot) / len(hot)),
                    "cold_query_candidates_mean": round(sum(cold) / len(cold)),
                    "recall_at3": round(hits / (3 * 24), 3),
                    "train_sec": train_sec,
                    "search_sec": search_sec,
                }
        exact3.unpersist()
        res[f"n{n}"] = row
    return res


def main() -> int:
    from eclypsium_etl_spark.session import get_spark

    out = fixture_dir()
    if "--ivf-skew" in sys.argv:
        # targeted run: the IVF skew kernel builds its own planted
        # fixtures and needs none of the 10x shards
        os.makedirs(out, exist_ok=True)
        spark = get_spark(app_name="scale-proof-ivf-skew")
        print(json.dumps({"ivf_skew": run_ivf_skew(spark)}, indent=1))
        return 0
    if "--rebuild" in sys.argv or not os.path.exists(f"{out}/_BUILT"):
        print(f"building 10x fixture at {out} ...", file=sys.stderr)
        build_fixture(out)

    spark = get_spark(app_name="scale-proof")
    # warm-up: JVM + parquet footer costs out of the timed region
    spark.read.parquet(f"{SF01}/documents.parquet").count()

    base = run_suite(spark, SF01)
    big = run_suite(spark, out)
    base["emb_pairs_kernel@0.9"] = planted_pairs(
        spark, f"{out}/emb_planted_1x.parquet"
    )
    big["emb_pairs_kernel@0.9"] = planted_pairs(
        spark, f"{out}/emb_planted_10x.parquet"
    )
    sbase = run_streaming(spark, SF01)
    sbig = run_streaming(spark, out)
    er_base = run_er(spark, f"{SF01}/customer.parquet")
    er_big = run_er(spark, f"{out}/customer.parquet")
    cdc_base = run_cdc(spark, 1)
    cdc_big = run_cdc(spark, 10)
    idx_base = run_inverted_index(spark, SF01)
    idx_big = run_inverted_index(spark, out)
    seg_base = run_posting_segments(spark, SF01)
    seg_big = run_posting_segments(spark, out)
    salt_growth = run_salt_growth(spark)
    bucket_growth = run_bucket_growth(spark)
    tri_base = knn_triangle_kernel(spark, f"{out}/emb_triads_1x.parquet")
    tri_big = knn_triangle_kernel(spark, f"{out}/emb_triads_10x.parquet")
    ivf_skew = run_ivf_skew(spark)
    er_entropy = run_er_entropy(spark)
    er_ladder = (
        run_er_ladder(spark)
        if os.environ.get("SPARK_GRAFT_ER_LADDER")
        else None
    )

    report, ok = {}, True
    for name in QUERIES + ["emb_pairs_kernel@0.9"]:
        t_ratio = round(big[name]["sec"] / max(base[name]["sec"], 0.05), 1)
        r_ratio = round(big[name]["rows"] / max(base[name]["rows"], 1), 1)
        passed = t_ratio <= MAX_RATIO and r_ratio <= MAX_RATIO
        ok &= passed
        report[name] = {
            "sf01_sec": base[name]["sec"], "x10_sec": big[name]["sec"],
            "time_ratio": t_ratio,
            "sf01_rows": base[name]["rows"], "x10_rows": big[name]["rows"],
            "rows_ratio": r_ratio, "subquadratic": passed,
        }
    stream_report = {}
    for name in STREAM_QUERIES:
        t_ratio = round(sbig[name]["sec"] / max(sbase[name]["sec"], 0.05), 1)
        # missing telemetry (or a zero baseline) must FAIL the bounded-
        # state check, not pass it vacuously (ADVICE r5): a stream that
        # records no stateOperators progress proves nothing about state
        if not sbase[name]["state_rows"] or sbig[name]["state_rows"] is None:
            s_ratio, passed = None, False
        else:
            s_ratio = round(
                sbig[name]["state_rows"] / sbase[name]["state_rows"], 1
            )
            # bounded state: peak rows must grow ~linearly (10x) with 10x
            # decorrelated input — same MAX_RATIO bound as the batch family
            passed = t_ratio <= MAX_RATIO and s_ratio <= MAX_RATIO
        ok &= passed
        stream_report[name] = {
            "sf01_sec": sbase[name]["sec"], "x10_sec": sbig[name]["sec"],
            "time_ratio": t_ratio,
            "sf01_state_rows": sbase[name]["state_rows"],
            "x10_state_rows": sbig[name]["state_rows"],
            "state_rows_ratio": s_ratio,
            "sf01_state_bytes": sbase[name]["state_bytes"],
            "x10_state_bytes": sbig[name]["state_bytes"],
            "sf01_rows": sbase[name]["rows"], "x10_rows": sbig[name]["rows"],
            "bounded_state": passed,
        }

    # warehouse kernels (VERDICT r5 #6): blocked ER — candidates/matches
    # ~10x, block sizes flat; CDC — same-keyspace output EXACTLY equal at
    # any changelog length, time ~linear in log rows
    er_t = round(er_big["sec"] / max(er_base["sec"], 0.05), 1)
    er_cand = round(er_big["candidates"] / max(er_base["candidates"], 1), 1)
    er_rows = round(er_big["rows"] / max(er_base["rows"], 1), 1)
    er_block = round(er_big["max_block"] / max(er_base["max_block"], 1), 1)
    er_ok = (
        er_t <= MAX_RATIO
        and er_cand <= MAX_RATIO
        and er_rows <= MAX_RATIO
        and er_block <= 2.0  # blocks multiply, they must not GROW
    )
    cdc_t = round(cdc_big["sec"] / max(cdc_base["sec"], 0.05), 1)
    cdc_log = round(cdc_big["log_rows"] / max(cdc_base["log_rows"], 1), 1)
    cdc_ok = cdc_t <= MAX_RATIO and cdc_big["rows"] == cdc_base["rows"]
    idx_t = round(idx_big["sec"] / max(idx_base["sec"], 0.05), 1)
    idx_ok = (
        idx_t <= MAX_RATIO and idx_base["cap_ok"] and idx_big["cap_ok"]
    )
    tri_t = round(tri_big["sec"] / max(tri_base["sec"], 0.05), 1)
    tri_ratios = {
        k: round(tri_big[k] / max(tri_base[k], 1), 1)
        for k in ("edges", "triangles", "wedges")
    }
    tri_ok = tri_t <= MAX_RATIO and all(
        r <= MAX_RATIO for r in tri_ratios.values()
    )
    # entropy-ceiling demonstration: candidates at the RIGHT block_chars
    # must grow ~linearly on homogeneous 4x growth, matches must be
    # block_chars-invariant (completeness-protected recall), and the
    # bc3 quadratic ratio is RECORDED as the documented ceiling, not
    # asserted — it is the hazard the knob exists to avoid.
    e1, e4 = er_entropy["n15000"], er_entropy["n60000"]
    ent_bc3 = round(e4["bc3"]["candidates"] / max(e1["bc3"]["candidates"], 1), 1)
    ent_bc5 = round(e4["bc5"]["candidates"] / max(e1["bc5"]["candidates"], 1), 1)
    ent_ok = (
        ent_bc5 <= 8.0
        and e1["bc3"]["matches"] == e1["bc5"]["matches"]
        and e4["bc3"]["matches"] == e4["bc5"]["matches"]
    )
    seg_t = round(seg_big["sec"] / max(seg_base["sec"], 0.05), 1)
    seg_fanout = round(
        seg_big["max_token_segments"] / max(seg_base["max_token_segments"], 1), 1
    )
    seg_ok = (
        seg_t <= MAX_RATIO and seg_base["cap_ok"] and seg_big["cap_ok"]
    )
    # layout-growth gates (homogeneous axis, VERDICT r7 #3): the knob at
    # the bigger scale must restore per-task/per-bucket load to the small-
    # scale baseline; the fixed-knob ratios are RECORDED ceilings.
    s1, s4 = salt_growth["n400000"], salt_growth["n1600000"]
    salt_fixed_ratio = round(
        s4["salts8"]["max_task_rows"] / max(s1["salts8"]["max_task_rows"], 1), 1
    )
    salt_knob_ratio = round(
        s4["salts32"]["max_task_rows"] / max(s1["salts8"]["max_task_rows"], 1), 1
    )
    salt_ok = (
        salt_knob_ratio <= 2.0
        and all(
            row[k]["joined_rows"] == row["rows"]
            for row in salt_growth.values()
            for k in row
            if k.startswith("salts")
        )
    )
    b1, b4 = bucket_growth["n250000"], bucket_growth["n1000000"]
    bucket_fixed_ratio = round(
        b4["buckets8"]["max_bucket_rows"]
        / max(b1["buckets8"]["max_bucket_rows"], 1),
        1,
    )
    bucket_knob_ratio = round(
        b4["buckets32"]["max_bucket_rows"]
        / max(b1["buckets8"]["max_bucket_rows"], 1),
        1,
    )
    bucket_ok = (
        bucket_knob_ratio <= 2.0
        and all(
            row[k]["join_exchanges"] == 0
            for row in bucket_growth.values()
            for k in row
            if k.startswith("buckets")
        )
    )
    ok &= er_ok and cdc_ok and idx_ok and tri_ok and ent_ok
    ok &= seg_ok and salt_ok and bucket_ok
    ladder_report = None
    if er_ladder is not None:
        ladder_ok = all(
            row[k]["matches"] == row["n_dirty"] and row[k]["cand_per_row"] <= 100
            for row in er_ladder.values()
            for k in row
            if k.startswith("bc")
        )
        ok &= ladder_ok
        ladder_report = {**er_ladder, "complete_and_linear_bounded": ladder_ok}
    warehouse_report = {
        "er_blocking_entropy_ceiling": {
            **er_entropy,
            "bc3_candidate_ratio_4x": ent_bc3,
            "bc5_candidate_ratio_4x": ent_bc5,
            "matches_block_chars_invariant_and_bc5_linear": ent_ok,
        },
        **(
            {"er_homogeneous_ladder_64x": ladder_report}
            if ladder_report is not None
            else {}
        ),
        "knn_triangle_kernel@0.9": {
            "sf01": tri_base, "x10": tri_big,
            "time_ratio": tri_t, **{f"{k}_ratio": v
                                    for k, v in tri_ratios.items()},
            "subquadratic": tri_ok,
        },
        "q304_blocked_levenshtein": {
            "sf01": er_base, "x10": er_big,
            "time_ratio": er_t, "candidates_ratio": er_cand,
            "rows_ratio": er_rows, "max_block_ratio": er_block,
            "subquadratic": er_ok,
        },
        "q305_cdc_apply": {
            "log1x": cdc_base, "log10x": cdc_big,
            "time_ratio": cdc_t, "log_rows_ratio": cdc_log,
            "state_rows_equal": cdc_big["rows"] == cdc_base["rows"],
            "linear_in_log": cdc_ok,
        },
        "q159_inverted_index": {
            "sf01": idx_base, "x10": idx_big,
            "time_ratio": idx_t,
            # rows grow with admitted VOCABULARY under decorrelated
            # sharding (by design, see run_inverted_index) — the bounded
            # quantities are wall time and max collected posting length
            "postings_capped_both_scales": idx_base["cap_ok"]
            and idx_big["cap_ok"],
            "linear_time_capped_postings": idx_ok,
        },
        "q318_posting_segments": {
            "sf01": seg_base, "x10": seg_big,
            "time_ratio": seg_t,
            "hot_token_segment_fanout_ratio": seg_fanout,
            "seg_cap_both_scales": seg_base["cap_ok"] and seg_big["cap_ok"],
            "linear_time_absolute_cap": seg_ok,
        },
        "q84_salt_growth_homogeneous": {
            **salt_growth,
            "fixed8_max_task_ratio_4x": salt_fixed_ratio,
            "salts32_restores_baseline_ratio": salt_knob_ratio,
            "semantics_invariant_and_knob_restores": salt_ok,
        },
        "ivf_trained_skew_axis": {
            **ivf_skew,
            "hot_candidates_fixed_k8_ratio_4x": round(
                ivf_skew["n80000"]["k8_p1"]["hot_query_candidates_mean"]
                / max(ivf_skew["n20000"]["k8_p1"]["hot_query_candidates_mean"], 1),
                1,
            ),
            "hot_candidates_k64_restores_ratio": round(
                ivf_skew["n80000"]["k64_p1"]["hot_query_candidates_mean"]
                / max(ivf_skew["n20000"]["k8_p1"]["hot_query_candidates_mean"], 1),
                1,
            ),
        },
        "q161_bucket_growth_homogeneous": {
            **bucket_growth,
            "fixed8_max_bucket_ratio_4x": bucket_fixed_ratio,
            "buckets32_restores_baseline_ratio": bucket_knob_ratio,
            "zero_exchange_all_rungs_and_knob_restores": bucket_ok,
        },
    }
    print(json.dumps({"fixture": out, "max_ratio": MAX_RATIO,
                      "all_subquadratic": ok, "queries": report,
                      "streaming": stream_report,
                      "warehouse": warehouse_report}, indent=1))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
