"""Replicates the driver's correctness gate locally (SURVEY §5.2 layer 5):
for every ``queries()`` entry with an ``oracle_sql()`` twin, run the Spark
query and the DuckDB SQL on the same parquet tables and compare row count
+ column names + order-insensitive canonical values."""

from __future__ import annotations

import datetime as dt
import importlib.util
import math
import os
from decimal import Decimal

import duckdb
import pytest

SF_DIR = os.environ.get("ATE_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

_spec = importlib.util.spec_from_file_location(
    "spark_entry",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "__spark_entry__.py"),
)
spark_entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and spark_entry)

QUERIES = spark_entry.queries()
ORACLES = spark_entry.oracle_sql()


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # queries round to ≥4dp; compare at 1e-9 granularity
        return f"{v:.9g}"
    if isinstance(v, (dt.datetime,)):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


# Queries allowed to return 0 rows. NONE today: an empty result means the
# gate proved nothing (VERDICT r4 #1 — curate_e2e hash-matched on 0 rows
# for a full round because the sf0.01 corpus was all-reject at the Gopher
# gate). Add a name here only with a comment saying WHY empty is correct.
EMPTY_OK: set[str] = set()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    res = duck.execute(ORACLES[name])
    dcols = [c[0] for c in res.description]
    drows = res.fetchall()

    if name not in EMPTY_OK:
        assert len(srows) > 0, (
            f"{name}: 0 rows — vacuously green (the oracle can only "
            f"confirm what the query actually emits)")
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} (spark) vs {len(drows)} (duckdb)")
    s_set = _rowset(scols, [[r[c] for c in scols] for r in srows])
    d_set = _rowset(dcols, drows)
    mism = [(a, b) for a, b in zip(s_set, d_set) if a != b]
    assert not mism, f"{name}: {len(mism)} differing rows; first: {mism[0]}"


def test_gate_queries_cover_both_branches(duck):
    """Boolean-gate queries must see BOTH branches in the gated corpus —
    a one-sided gate (all-keep or all-reject) hash-matches while proving
    nothing about the other branch (VERDICT r4 #1: every sf0.01 row was
    gopher_keep=false for a full round). Checked on the oracle side: the
    parametrized hash gate above already pins Spark ≡ oracle, so a
    two-branch oracle implies a two-branch Spark result."""
    for name, col in [("gopher_quality_flags", "gopher_keep"),
                      ("curation_policy", "keep"),
                      ("decontaminate", "flagged")]:
        vals = {r[0] for r in duck.execute(
            f"SELECT DISTINCT {col} FROM ({ORACLES[name]})").fetchall()}
        assert vals == {True, False}, (
            f"{name}.{col}: one-sided gate — saw only {vals}")
    # the flagship's downstream stages (keep-join, stratified draw) must
    # see more than one stratum, not just >0 rows
    types = {r[0] for r in duck.execute(
        f"SELECT DISTINCT content_type FROM ({ORACLES['curate_e2e']})"
    ).fetchall()}
    assert len(types) >= 2, f"curate_e2e: single-stratum sample {types}"


def test_every_query_runs(spark):
    """Queries without an oracle still must run and return a schema."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_DIR)
        assert df.columns, name
        assert df.count() >= 0, name


def test_gate_order_covers_flagships():
    """The external driver gates only the FIRST 50 registry entries
    (observed r3: 56 registered → 50 gated, both e2e flagships evicted).
    Pin the invariant: every non-twin — in particular the flagships and
    the sampling/LM family — sits inside the cap, and the demoted twins
    are still registered (this module's parametrized gate covers them)."""
    names = list(QUERIES)
    gated = set(names[: spark_entry.GATE_CAP])
    must_gate = {
        "extract_transcripts_e2e", "extract_transcripts_e2e_pdf",
        "stratified_sample", "pack_sequences",
        "unigram_logprob", "bigram_logprob",
    }
    assert must_gate <= gated, sorted(must_gate - gated)
    # nothing outside the cap except the declared twins
    assert set(names[spark_entry.GATE_CAP:]) <= set(spark_entry.GATE_TAIL)
    # twins stay registered (and oracle-gated locally)
    assert set(spark_entry.GATE_TAIL) <= set(names)


def test_entry_smoke(spark):
    df = spark_entry.entry(spark)
    n = df.count()
    assert n > 0
    assert {"conv_id", "turn_idx", "extracted_text"} <= set(df.columns)
