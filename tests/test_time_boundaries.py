"""TIME-BOUNDARY differential walk — the seventh adversarial-fixture
axis (after null / empty / unicode / skewed-key / clustered-embeddings
/ extreme-values; VERDICT r10 #5).

The fixtures' temporal columns are calendar-BENIGN by construction:
events.ts spans a quiet modern range and the order/ship dates sit mid-
decade, so the paths where epoch sign handling, day/year-boundary
truncation, leap-day arithmetic, DST-shaped wall-clock instants, far-
past/far-future extremes, and streaming watermark math actually matter
had never been differentially exercised. The engines also genuinely
differ in temporal architecture — Spark's TimestampType is session-
timezone-aware where DuckDB's TIMESTAMP is naive, Spark's cast-to-long
is a floorDiv of microseconds where DuckDB spells epoch() — so every
boundary instant is a divergence candidate, not a cosmetic variation.

Planted instants, via deterministic residue masks on EVERY temporal
column (measures, keys and text stay clean — those are other axes):
  - epoch zero and the last pre-epoch microsecond (sign of the
    underlying int64 flips; floor-vs-truncate divergences live here)
  - leap day 2024-02-29 at the day's last microsecond
  - year boundary: 2023-12-31 23:59:59.999999 / 2024-01-01 00:00:00
  - US-DST-shaped wall instants (2025-03-09 02:30, 2025-11-02 01:30):
    inert under the pinned-UTC config, exactly the point — the PLAIN
    driver walk runs on the host timezone, where a DST-gap instant is
    the classic session-TZ landmine
  - far past (1900) with sub-second precision, far future (2199 —
    inside the TIMESTAMP(NANOS) range, which the fixture decode may
    carry) and, on dates, 9998-12-31 (so +90-day arithmetic stays
    inside the calendar) and the Gregorian adoption date 1582-10-15
    (both engines are proleptic; pinned so a regression to hybrid-
    calendar handling would surface)

Deliberately OUT of scope (documented ingest-contract boundaries, the
extremes battery's q341 pattern): timestamps outside 0001..9999 or the
ns-overflow band past 2262 (engine-defined overflow/error, a numeric
gate at the door), leap seconds (not representable in either engine),
and NULL timestamps (the null axis owns those).

Gated behind SPARK_GRAFT_TIME_SWEEP=1 (builds the variant fixture once
per source-fixture stamp under /tmp):

    SPARK_GRAFT_TIME_SWEEP=1 python -m pytest tests/test_time_boundaries.py -q
"""

from __future__ import annotations

import os
import shutil
import tempfile

import duckdb
import pytest

from eclypsium_etl_spark import registry
from eclypsium_etl_spark.io import source_stamp

from .conftest import FIXTURE_TABLES, SF_CHECK
from .parity import compare

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_TIME_SWEEP"),
    reason="set SPARK_GRAFT_TIME_SWEEP=1 to run the time-boundary walk",
)

QUERIES, ORACLE = registry.load_all()

# (b) documented preconditions — the query must RAISE a clear message.
PRECONDITION: dict[str, str] = {}

# (c) literal-pinned oracles / fixture-content literals: contract here
# is run-without-crashing with a stable schema.
RUN_ONLY = {
    "q245_analyze_stats",  # DESC EXTENDED literals for the 50-row t_q244
}

GREEN = sorted(set(ORACLE) - set(PRECONDITION) - RUN_ONLY)

# Residue masks per table (row keys mirror the extremes battery).
# ~2% of rows per planted instant keeps distributions recognizably
# real while every calendar boundary is hit.
_MASKS = {
    "events": """
        CASE WHEN event_id % 53 = 0 THEN TIMESTAMP '1970-01-01 00:00:00'
             WHEN event_id % 53 = 1 THEN TIMESTAMP '1969-12-31 23:59:59.999999'
             WHEN event_id % 53 = 2 THEN TIMESTAMP '2024-02-29 23:59:59.999999'
             WHEN event_id % 53 = 3 THEN TIMESTAMP '2023-12-31 23:59:59.999999'
             WHEN event_id % 53 = 4 THEN TIMESTAMP '2024-01-01 00:00:00'
             WHEN event_id % 53 = 5 THEN TIMESTAMP '2025-03-09 02:30:00'
             WHEN event_id % 53 = 6 THEN TIMESTAMP '2025-11-02 01:30:00'
             WHEN event_id % 53 = 7 THEN TIMESTAMP '1900-06-15 12:34:56.789012'
             WHEN event_id % 53 = 8 THEN TIMESTAMP '2199-12-31 23:59:59'
             ELSE ts END AS ts
    """,
    "orders": """
        CASE WHEN o_orderkey % 59 = 0 THEN TIMESTAMP '1970-01-01 00:00:00'
             WHEN o_orderkey % 59 = 1 THEN TIMESTAMP '2024-02-29 00:00:00'
             WHEN o_orderkey % 59 = 2 THEN TIMESTAMP '2023-12-31 00:00:00'
             WHEN o_orderkey % 59 = 3 THEN TIMESTAMP '2024-01-01 00:00:00'
             WHEN o_orderkey % 59 = 4 THEN TIMESTAMP '9998-12-31 00:00:00'
             WHEN o_orderkey % 59 = 5 THEN TIMESTAMP '1582-10-15 00:00:00'
             ELSE o_orderdate END AS o_orderdate
    """,
    "lineitem": """
        CASE WHEN (l_orderkey * 10 + l_linenumber) % 61 = 0
                  THEN TIMESTAMP '1970-01-01 00:00:00'
             WHEN (l_orderkey * 10 + l_linenumber) % 61 = 1
                  THEN TIMESTAMP '2024-02-29 00:00:00'
             WHEN (l_orderkey * 10 + l_linenumber) % 61 = 2
                  THEN TIMESTAMP '2023-12-31 23:59:59'
             WHEN (l_orderkey * 10 + l_linenumber) % 61 = 3
                  THEN TIMESTAMP '2024-01-01 00:00:00'
             WHEN (l_orderkey * 10 + l_linenumber) % 61 = 4
                  THEN TIMESTAMP '2199-12-31 00:00:00'
             ELSE l_shipdate END AS l_shipdate
    """,
}


def _time_fixture_dir() -> str:
    """Build (once per source stamp) the time-boundary fixture: masked
    tables rewritten via DuckDB, untouched tables copied byte-identical."""
    stamp = source_stamp(os.path.join(SF_CHECK, "events.parquet"))
    out = os.path.join(
        tempfile.gettempdir(),
        "eclypsium_etl_spark",
        f"timefx_v1_{os.path.basename(SF_CHECK)}_{stamp}",
    )
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    tmp = f"{out}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        src = os.path.join(SF_CHECK, f"{t}.parquet")
        dst = os.path.join(tmp, f"{t}.parquet")
        if t in _MASKS:
            con.execute(
                f"COPY (SELECT * REPLACE ({_MASKS[t]}) "
                f"FROM read_parquet('{src}')) TO '{dst}' (FORMAT PARQUET)"
            )
        else:
            shutil.copyfile(src, dst)
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the race: use theirs
    return out


@pytest.fixture(scope="session")
def time_fx() -> str:
    return _time_fixture_dir()


@pytest.fixture(scope="session")
def duck_time(time_fx):
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{time_fx}/{t}.parquet')"
        )
    return con


def test_instants_actually_planted(duck_time):
    """Guard against a silently-benign mask: every planted instant class
    must be present, else the sweep degenerates to the uniform walk."""
    checks = [
        ("events", "ts = TIMESTAMP '1970-01-01 00:00:00'"),
        ("events", "ts < TIMESTAMP '1970-01-01'"),
        ("events", "ts = TIMESTAMP '2024-02-29 23:59:59.999999'"),
        ("events", "ts = TIMESTAMP '2023-12-31 23:59:59.999999'"),
        ("events", "ts = TIMESTAMP '2024-01-01 00:00:00'"),
        ("events", "ts = TIMESTAMP '2025-03-09 02:30:00'"),
        ("events", "ts = TIMESTAMP '2025-11-02 01:30:00'"),
        ("events", "ts < TIMESTAMP '1950-01-01'"),
        ("events", "ts > TIMESTAMP '2199-01-01'"),
        ("orders", "o_orderdate = TIMESTAMP '2024-02-29 00:00:00'"),
        ("orders", "o_orderdate = TIMESTAMP '9998-12-31 00:00:00'"),
        ("orders", "o_orderdate = TIMESTAMP '1582-10-15 00:00:00'"),
        ("lineitem", "l_shipdate = TIMESTAMP '2024-02-29 00:00:00'"),
        ("lineitem", "l_shipdate > TIMESTAMP '2199-01-01'"),
        ("lineitem", "l_shipdate = TIMESTAMP '1970-01-01 00:00:00'"),
    ]
    for t, pred in checks:
        n = duck_time.execute(
            f"SELECT COUNT(*) FROM {t} WHERE {pred}"
        ).fetchone()[0]
        assert n > 0, f"{t}: no rows where {pred} — mask is cold"


@pytest.mark.parametrize("name", GREEN)
def test_time_core_parity(name, spark, time_fx, duck_time):
    ok, detail = compare(
        QUERIES[name](spark, time_fx), duck_time, ORACLE[name]
    )
    assert ok, f"{name} on time-boundary fixture: {detail}"


@pytest.mark.parametrize("name", sorted(RUN_ONLY))
def test_time_run_only(name, spark, time_fx):
    df = QUERIES[name](spark, time_fx)
    assert df.columns
    df.collect()


@pytest.mark.parametrize("name", sorted(PRECONDITION))
def test_time_preconditions_raise(name, spark, time_fx):
    with pytest.raises(Exception, match=PRECONDITION[name]):
        QUERIES[name](spark, time_fx).collect()
