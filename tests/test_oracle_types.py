"""Guard every DuckDB oracle against driver-unsafe result types.

The round-4 correctness gate went red on ``sequence_packing`` and
``mixture_weights`` even though selfcheck printed ALL OK: DuckDB types an
uncast ``sum(BIGINT)`` as HUGEINT, selfcheck's ``fetchall()`` renders that
as a Python int, but the DRIVER fetches through pandas where HUGEINT (and
DECIMAL) coerce to float64 — ``7.0`` vs Spark's ``7`` — so the value hash
diverges.  This test makes the whole class unrepresentable: every
``oracle_sql()`` entry must type-check clean before it can ship.

No Spark session needed — DuckDB alone types the result relations.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Types whose pandas representation diverges from fetchall()'s: the driver
# compares through pandas, so any of these in an oracle output column can
# hash-mismatch against Spark while selfcheck-style fetchall() agrees.
BANNED_TYPE_FRAGMENTS = ("HUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _oracle_items():
    return sorted(entry.oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_result_types_are_driver_safe(con, name, sql):
    rel = con.sql(sql)
    offenders = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if any(k in str(typ).upper() for k in BANNED_TYPE_FRAGMENTS)
    ]
    assert not offenders, (
        f"oracle {name!r} emits driver-unsafe column types {offenders}: the "
        "driver's pandas fetch coerces HUGEINT/DECIMAL to float64 and the "
        "value hash diverges from Spark's integer rendering. Wrap the "
        "expression in CAST(... AS BIGINT) (or AS DOUBLE for ratios)."
    )


def test_all_catalog_oracles_covered():
    # queries() entries without an oracle are the documented rows-only set;
    # this just pins that the parametrized test above saw every oracle.
    assert len(entry.oracle_sql()) >= 80


def test_kmeans_oracles_keep_scale_viable_shape():
    """Textual pin of the sf10 oracle-viability fixes (SCALE.md r10): the
    assignment windows must ORDER BY a precomputed narrow `sim` column —
    a window ORDER BY that references the dim-64 vector lists materializes
    them into a ~90 GB sort at sf10 (the OOM class) — and the
    multiply-referenced CTEs stay MATERIALIZED so DuckDB does not re-run
    the quantize+norm chain per reference."""
    from kafka_backup_spark.queries import textops

    for sql in (
        textops.SQL_EMBEDDING_NEAR_DUP,
        textops.SQL_IVF_TOPK,
        textops.SQL_CLUSTER_BALANCE,
    ):
        assert "AS MATERIALIZED" in sql
        assert "ORDER BY sim DESC" in sql
        # no window may order by an inline inner-product over the vectors
        import re

        for m in re.finditer(r"row_number\(\) OVER \([^)]*ORDER BY ([^)]*)\)", sql):
            assert "list_inner_product" not in m.group(1), m.group(0)
    for sql in (
        textops.SQL_DUP_MEMBERSHIP,
        textops.SQL_DUP_CLUSTERS,
        textops.SQL_EMBEDDING_DUP_CLUSTERS,
    ):
        assert "AS MATERIALIZED" in sql  # recursive CTEs re-run plain CTEs


@pytest.mark.parametrize(
    "name", ["dup_clusters", "dup_membership", "embedding_dup_clusters"]
)
def test_label_prop_alt_oracle_matches_recursive(con, name):
    """The driver-looped min-label-propagation twin (r11, selfcheck
    SPARK_GRAFT_SELF_ALT) must produce EXACTLY the recursive closure's
    rows — label propagation converges to min-reachable-id per connected
    component, so any divergence is a bug in the loop, not semantics."""
    from kafka_backup_spark.queries.textops import run_closure_alt_oracle

    want = sorted(map(tuple, con.sql(entry.oracle_sql()[name]).fetchall()))
    got_rel = run_closure_alt_oracle(con, name)
    got_cols = list(got_rel.columns)
    got = sorted(map(tuple, got_rel.fetchall()))
    ref_cols = list(con.sql(entry.oracle_sql()[name]).columns)
    assert got_cols == ref_cols
    assert got == want


def test_pair_verify_alt_oracle_matches_reference(con):
    """The scale-hardened pair-verify formulation (r12: MATERIALIZED CTEs +
    preserve_insertion_order=false, run via run_alt_oracle) must produce
    EXACTLY the reference near_dup_pipeline oracle's rows — the hardening
    is execution-shape only, never semantics."""
    from kafka_backup_spark.queries.textops import run_alt_oracle

    ref_rel = con.sql(entry.oracle_sql()["near_dup_pipeline"])
    ref_cols = list(ref_rel.columns)
    want = sorted(map(tuple, ref_rel.fetchall()))
    got_rel = run_alt_oracle(con, "near_dup_pipeline")
    assert list(got_rel.columns) == ref_cols
    assert sorted(map(tuple, got_rel.fetchall())) == want
    assert len(want) > 0  # the gate corpus plants real near-dups
    # the streaming setting must be restored after the alt run
    assert con.sql(
        "SELECT current_setting('preserve_insertion_order')"
    ).fetchone()[0]


@pytest.mark.parametrize("name", ["dup_clusters", "dup_membership"])
def test_alt_closure_oracles_ride_scale_pair_sql(con, name):
    """run_alt_oracle's closure twins now build lp_pairs from the scale
    pair SQL — results must still equal the reference recursive oracle."""
    from kafka_backup_spark.queries.textops import run_alt_oracle

    want = sorted(map(tuple, con.sql(entry.oracle_sql()[name]).fetchall()))
    got = sorted(map(tuple, run_alt_oracle(con, name).fetchall()))
    assert got == want
