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
           "q284_corpus_manifest"]
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
    # v2: adds the 10x events shards for the streaming family
    return f"/tmp/eclypsium_etl_spark/scale10v2_{stamp}"


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
    open(f"{out}/_BUILT", "w").close()


def run_suite(spark, sf_dir: str) -> dict[str, dict]:
    from eclypsium_etl_spark.registry import load_all

    q, _ = load_all()
    res = {}
    for name in QUERIES:
        df = q[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        res[name] = {"sec": round(wall, 2), "rows": q[name](spark, sf_dir).count()}
    return res


def run_streaming(spark, sf_dir: str) -> dict[str, dict]:
    """Run the streaming family end-to-end (the query fn drains the
    availableNow replay internally); record wall time, result rows, and
    the stream's own state-store telemetry (peak rows/bytes across
    micro-batches) captured by run_available_now."""
    from eclypsium_etl_spark.registry import load_all
    from eclypsium_etl_spark.streaming import queries as sq

    q, _ = load_all()
    res = {}
    for name in STREAM_QUERIES:
        t0 = time.perf_counter()
        n = q[name](spark, sf_dir).count()
        wall = time.perf_counter() - t0
        state = next(iter(sq.LAST_STATE_METRICS.values()), {})
        res[name] = {
            "sec": round(wall, 2),
            "rows": n,
            "state_rows": state.get("peak_state_rows", 0),
            "state_bytes": state.get("peak_state_bytes", 0),
        }
    return res


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


def main() -> int:
    from eclypsium_etl_spark.session import get_spark

    out = fixture_dir()
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
        s_ratio = round(
            sbig[name]["state_rows"] / max(sbase[name]["state_rows"], 1), 1
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
    print(json.dumps({"fixture": out, "max_ratio": MAX_RATIO,
                      "all_subquadratic": ok, "queries": report,
                      "streaming": stream_report}, indent=1))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
