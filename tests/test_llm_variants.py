"""Scale-path variants that have no cross-engine oracle (engine-specific
hash families): checked by recall against the exact kernels instead."""

from __future__ import annotations

from eclypsium_etl_spark.llm.dedup import minhash_lsh_ml_pairs, q63_dedup_near
from eclypsium_etl_spark.llm.multimodal import decode_media
from eclypsium_etl_spark.llm.similarity import lsh_pairs, q65_sim_pairs

from .conftest import SF_SMOKE

import pytest


def test_minhash_ml_recall(spark):
    """pyspark.ml MinHashLSH must recover most exact-Jaccard pairs."""
    exact = {
        (r.doc_a, r.doc_b) for r in q63_dedup_near(spark, SF_SMOKE).collect()
    }
    approx = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_ml_pairs(spark, SF_SMOKE, tau=0.4).collect()
    }
    assert exact, "fixture should contain near-dup pairs"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"MinHashLSH recall too low: {recall:.2f}"


def test_brp_lsh_pairs_runs_and_is_subset_sane(spark):
    """BucketedRandomProjection pairs: every reported pair above the cosine
    threshold must also be found by the exact kernel (no false positives
    after distance filtering; candidates are approximate, distances exact)."""
    exact = {
        (r.vec_a, r.vec_b): r.sim for r in q65_sim_pairs(spark, SF_SMOKE).collect()
    }
    approx = lsh_pairs(spark, SF_SMOKE, threshold=0.30).collect()
    for r in approx:
        assert (r.vec_a, r.vec_b) in exact, f"false positive pair {r}"


def test_shingles_short_docs_yield_empty(spark):
    """Docs with ≤2 whitespace tokens must produce an EMPTY shingle array,
    not a descending sequence(1, n≤0) that makes slice() throw (ADVICE r1)."""
    from pyspark.sql import functions as F

    from eclypsium_etl_spark.llm.dedup import _SHINGLES_EXPR

    df = spark.createDataFrame(
        [("one",), ("two words",), ("three word doc",), ("now four word doc",)],
        "text string",
    )
    sizes = [r.n for r in df.select(F.size(F.expr(_SHINGLES_EXPR)).alias("n")).collect()]
    assert sizes == [0, 0, 1, 2]


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image/png")
