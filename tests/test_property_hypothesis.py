"""Property-based tests (hypothesis) for the reusable kernels: algebraic
laws that must hold on ARBITRARY inputs, not just the fixture — the
complement to the fixed-seed brute-force tests in test_ops_properties.

Example counts are deliberately small (each example is a Spark round
trip); shrinking still gives a minimal counterexample on failure."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from eclypsium_etl_spark import ops

T0 = datetime(2024, 1, 1)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, minutes-offset) event rows; ids assigned by position
events_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500)),
    min_size=1,
    max_size=40,
)


@given(rows=events_strategy, perm_seed=st.integers(0, 2**16))
@SETTINGS
def test_sessionize_is_permutation_invariant(spark, rows, perm_seed):
    """Session STRUCTURE (per-key multiset of session sizes) must not
    depend on input row order — the property that makes backfills
    rerun-stable regardless of file arrival order."""
    import random

    data = [
        (i, k, T0 + timedelta(minutes=m)) for i, (k, m) in enumerate(rows)
    ]
    shuffled = data[:]
    random.Random(perm_seed).shuffle(shuffled)

    def structure(raw):
        df = spark.createDataFrame(raw, "id long, k long, ts timestamp")
        s = ops.sessionize(df, "k", "ts", "INTERVAL 10 MINUTES", tiebreak="id")
        return sorted(
            (r.k, r.n)
            for r in s.groupBy("k", "session_id").agg(F.count("*").alias("n")).collect()
        )

    assert structure(data) == structure(shuffled)


@given(rows=events_strategy)
@SETTINGS
def test_salted_join_equals_plain_join(spark, rows):
    """Salting must be semantically invisible: identical result multiset
    to the unsalted equi join, for any data distribution (including the
    all-one-key worst case hypothesis likes to generate)."""
    fact = spark.createDataFrame(
        [(i, k, float(m)) for i, (k, m) in enumerate(rows)],
        "id long, k long, v double",
    )
    dim = spark.createDataFrame(
        [(k, f"dim{k}") for k in {k for k, _ in rows}], "k long, label string"
    )
    plain = sorted(
        (r.id, r.k, r.label)
        for r in fact.join(dim, "k").select("id", "k", "label").collect()
    )
    salted = sorted(
        (r.id, r.k, r.label)
        for r in ops.salted_join(fact, dim, "k", salt_from="id", n_salts=4)
        .select("id", "k", "label")
        .collect()
    )
    assert plain == salted


@given(rows=events_strategy)
@SETTINGS
def test_dedup_keep_first_is_idempotent_and_minimal(spark, rows):
    """Applying keep-first twice changes nothing, survivors are one per
    key, and each survivor is the true minimum under the order."""
    df = spark.createDataFrame(
        [(i, k, m) for i, (k, m) in enumerate(rows)], "id long, k long, m long"
    )
    once = ops.dedup_keep_first(df, ["k"], [F.asc("m"), F.asc("id")])
    twice = ops.dedup_keep_first(once, ["k"], [F.asc("m"), F.asc("id")])
    got = sorted((r.k, r.m, r.id) for r in once.collect())
    assert got == sorted((r.k, r.m, r.id) for r in twice.collect())
    # exactly one survivor per distinct key, and it is the minimum
    expect = {}
    for i, (k, m) in enumerate(rows):
        if k not in expect or (m, i) < expect[k]:
            expect[k] = (m, i)
    assert got == sorted((k, m, i) for k, (m, i) in expect.items())


@given(rows=events_strategy)
@SETTINGS
def test_global_running_sum_matches_sequential(spark, rows):
    """The two-phase distributed prefix sum equals the sequential scan in
    the same total order, for any value distribution."""
    data = [(i, k, (m % 7) * 10) for i, (k, m) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, k long, cents long")
    out = ops.global_running_sum(
        df, order_cols=["id"], value_col="cents", out_col="run", partitions=3
    )
    got = {r.id: r.run for r in out.collect()}
    acc = 0
    for i, _, c in data:
        acc += c
        assert got[i] == acc


@given(ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=12, unique=True))
@SETTINGS
def test_png_codec_roundtrip_arbitrary_ids(ids):
    """PNG encode→decode (q260) is the identity on channel sums for
    ARBITRARY doc ids — the codec (chunk CRCs, split IDAT, inflate,
    Sub/Up unfiltering) must not depend on fixture-range ids. Pure
    in-process check, no Spark round trip."""
    import pandas as pd

    from eclypsium_etl_spark.llm.multimodal import (
        _png_pixel,
        decode_png_batches,
        encode_png_batches,
    )

    pdf = pd.DataFrame({"doc_id": ids})
    enc = next(encode_png_batches(iter([pdf])))
    dec = next(decode_png_batches(iter([enc])))
    for _, row in dec.iterrows():
        d = int(row.doc_id)
        w, h = 8 + d % 8, 6
        assert (row.width, row.height) == (w, h)
        for ch, col in enumerate(("r_sum", "g_sum", "b_sum")):
            assert row[col] == sum(
                _png_pixel(d, i)[ch] for i in range(w * h)
            ), (d, col)


@given(
    lens=st.lists(st.integers(1, 700), min_size=1, max_size=25),
    L=st.sampled_from([16, 64, 256]),
)
@SETTINGS
def test_token_chunks_partition_exactly(spark, lens, L):
    """q277's manifest invariants on arbitrary doc lengths and block
    sizes: (1) each doc's fragments sum to its token count and tile its
    span contiguously; (2) every interior block is filled to EXACTLY L
    (zero padding — the point of concat-and-chunk); (3) fragment offsets
    never escape [0, L)."""
    from eclypsium_etl_spark import ops
    from pyspark.sql import functions as F

    t = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lens)], "doc_id long, n_tok long"
    )
    off = ops.global_running_sum(t, ["doc_id"], "n_tok", "__end").withColumn(
        "tok_start", F.col("__end") - F.col("n_tok")
    )
    frags = off.select(
        "doc_id",
        "n_tok",
        F.explode(
            F.expr(
                f"sequence(CAST(floor(tok_start / {L}) AS BIGINT),"
                f" CAST(floor((tok_start + n_tok - 1) / {L}) AS BIGINT))"
            )
        ).alias("block_id"),
        "tok_start",
    ).select(
        "doc_id",
        "n_tok",
        "block_id",
        (
            F.greatest(F.col("tok_start"), F.col("block_id") * L)
            - F.col("block_id") * L
        ).alias("pos_in_block"),
        (
            F.least(F.col("tok_start") + F.col("n_tok"), (F.col("block_id") + 1) * L)
            - F.greatest(F.col("tok_start"), F.col("block_id") * L)
        ).alias("n_frag"),
    ).collect()

    total = sum(lens)
    per_doc: dict[int, int] = {}
    per_block: dict[int, int] = {}
    for r in frags:
        assert 0 <= r.pos_in_block < L and 1 <= r.n_frag <= L
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.n_frag
        per_block[r.block_id] = per_block.get(r.block_id, 0) + r.n_frag
    assert per_doc == {i: n for i, n in enumerate(lens)}
    last_block = max(per_block)
    for b, filled in per_block.items():
        assert filled == (L if b < last_block else total - last_block * L)


def _ref_bpe(word_counts: dict[str, int], rounds: int):
    """Reference BPE (pure Python, textbook formulation): symbol lists,
    weighted adjacent-pair counts, greedy left-to-right merge of the
    (count desc, pair asc) argmax. Tie order matches the engine's
    bracket-encoded pairs because '<' < alphanumerics in ASCII and the
    bracket encoding is order-preserving on the underlying symbols."""
    seqs = {w: [f"<{c}>" for c in w] for w in word_counts}
    merges = []
    for _ in range(rounds):
        counts: dict[tuple, int] = {}
        for w, syms in seqs.items():
            n = word_counts[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        (a, b), cnt = best
        merged = a[:-1] + b[1:]  # '<x>' + '<y>' -> '<xy>'
        merges.append((f"{a} {b}", merged, cnt))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6), min_size=1, max_size=10
    )
)
@SETTINGS
def test_bpe_chain_matches_reference(spark, tmp_path, words):
    """The distributed BPE (q268's bracket-encoded string-replace merge)
    must equal a textbook pure-Python BPE — greedy left-to-right merge
    application, weighted counts, deterministic tie-break — on ARBITRARY
    tiny corpora, where adjacent/overlapping pair runs ('aaaa') exercise
    exactly the replace-semantics pitfalls."""
    import collections
    import uuid

    from eclypsium_etl_spark.llm.text import bpe_learn_chain

    doc = " ".join(words)
    out = tmp_path / f"bpe_{uuid.uuid4().hex[:8]}"
    out.mkdir()
    spark.createDataFrame(
        [(0, doc, "en", "t", len(doc))],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    results, _ = bpe_learn_chain(spark, str(out), rounds=3)
    got = []
    for r in results:
        row = r.collect()
        if row and row[0].cnt is not None:
            got.append((row[0].pair, row[0].merged, row[0].cnt))
    expect = _ref_bpe(dict(collections.Counter(words)), 3)
    assert got[: len(expect)] == expect, (got, expect, words)


@given(
    deltas=st.lists(st.integers(-50, 50), min_size=1, max_size=30),
)
@SETTINGS
def test_clamped_fold_matches_reference(spark, deltas):
    """q299's floor-at-zero ledger fold (expression-level aggregate()
    over a sorted struct array) must equal the obvious sequential Python
    fold on arbitrary delta sequences — including runs that bounce off
    the zero floor repeatedly, where associativity violations would
    show."""
    from pyspark.sql import functions as F

    rows = [(0, i, d) for i, d in enumerate(deltas)]
    df = spark.createDataFrame(rows, "user_id long, seq long, delta long")
    got = (
        df.groupBy("user_id")
        .agg(
            F.expr(
                "aggregate("
                " transform(array_sort(collect_list(struct(seq, delta))),"
                "           r -> r.delta),"
                " CAST(0 AS BIGINT),"
                " (acc, d) -> greatest(CAST(0 AS BIGINT), acc + d))"
            ).alias("bal")
        )
        .collect()[0]
        .bal
    )
    ref = 0
    for d in deltas:
        ref = max(0, ref + d)
    assert got == ref, (deltas, got, ref)


# CDC changelog: (key, seq, op-index) with ops I/U/D; seqs may collide
cdc_strategy = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 8), st.integers(0, 2)),
    min_size=1,
    max_size=40,
)


@given(rows=cdc_strategy)
@SETTINGS
def test_cdc_apply_matches_sequential_replay(spark, rows):
    """ops.cdc_apply (q305's kernel) must equal a per-key sequential
    replay of the changelog in (seq, tombstone-first, op-desc) order:
    the surviving rows are exactly the keys whose LAST op isn't a
    delete, carrying that op's payload. Ties on seq resolve
    delete-first then op-desc — deterministic on every rerun."""
    ops_names = ["I", "U", "D"]
    # duplicate (k, seq, op) coordinates with DISTINCT payloads are kept
    # on purpose: the kernel's order is total over whole rows (payload
    # columns are the final tie-break, ADVICE r5), so even those resolve
    # to the max-payload row on every rerun
    log = [
        (k, seq, ops_names[op], f"v{i % 3}")
        for i, (k, seq, op) in enumerate(rows)
    ]
    df = spark.createDataFrame(log, "k long, seq long, op string, payload string")
    got = {
        (r.k, r.seq, r.op, r.payload)
        for r in ops.cdc_apply(df, ["k"], seq_col="seq", op_col="op").collect()
    }
    # brute force: winner per key under the same total order
    want = {}
    for k, seq, op, payload in log:
        # mirror of the kernel's DESC order incl. the payload tie-break
        rank = (seq, op == "D", op, payload)
        if k not in want or rank > want[k][0]:
            want[k] = (rank, (k, seq, op, payload))
    expected = {row for rank, row in want.values() if row[2] != "D"}
    assert got == expected
