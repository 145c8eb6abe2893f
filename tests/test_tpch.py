"""Plan-shape tests for the TPC-H-shaped star module (plans/tpch.py):
dimensions must broadcast, the only wide shuffle is lineitem⋈orders,
and conditional ratios stay one-pass. Value parity vs DuckDB is
covered by test_oracle_parity."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_broadcasts_all_dims(spark):
    from weatherflow_spark.plans.tpch import q_tpch_q5

    plan = _plan(q_tpch_q5(spark, SF_SMALL))
    # customer, supplier, nation, region all broadcast → ≥4 BHJ;
    # exactly one sort-merge/shuffle-hash join may remain (li⋈orders).
    assert plan.count("BroadcastHashJoin") >= 4


def test_q14_is_single_pass(spark):
    from weatherflow_spark.plans.tpch import q_tpch_q14

    plan = _plan(q_tpch_q14(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    # numerator+denominator in one aggregate: lineitem scanned once.
    assert plan.count("FileScan parquet") <= 2  # lineitem + part


def test_q14_prunes_and_pushes_down(spark):
    from weatherflow_spark.plans.tpch import q_tpch_q14

    df = q_tpch_q14(spark, SF_SMALL)
    formatted = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # shipdate range predicate reaches the parquet scan
    assert "PushedFilters" in formatted
    assert "l_shipdate" in formatted.split("PushedFilters")[1].splitlines()[0]


def test_supplier_rank_no_shuffle_for_dim_joins(spark):
    from weatherflow_spark.plans.tpch import q_supplier_rank

    plan = _plan(q_supplier_rank(spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") >= 2
    # only the window's own partitioning exchanges rows
    assert plan.count("Exchange hashpartitioning") <= 1


# ---------------------------------------------------------------------------
# r9 continuation: derived partsupp + the six queries completing 22/22
# ---------------------------------------------------------------------------


def test_derived_partsupp_invariants(spark):
    """The derived table must behave like dbgen's partsupp: exactly
    four suppliers per part, (partkey, suppkey) a primary key BY
    CONSTRUCTION (four consecutive integers mod S are distinct for
    S >= 4), suppkey inside [1, S], and the canonical value domains
    (availqty 1..9999, supplycost 1.00..999.99 in cents)."""
    from weatherflow_spark.io import load_table
    from weatherflow_spark.plans.tpch_ps import derived_partsupp

    ps = derived_partsupp(spark, SF_SMALL).cache()
    try:
        n_part = load_table(spark, SF_SMALL, "part").count()
        n_supp = load_table(spark, SF_SMALL, "supplier").count()
        assert ps.count() == 4 * n_part
        assert ps.select("ps_partkey", "ps_suppkey").distinct().count() == 4 * n_part
        lo, hi, alo, ahi, clo, chi = ps.selectExpr(
            "min(ps_suppkey)", "max(ps_suppkey)",
            "min(ps_availqty)", "max(ps_availqty)",
            "min(ps_supplycost_c)", "max(ps_supplycost_c)",
        ).first()
        # 0-based like the testdata's supplier keys: every derived
        # suppkey must be a REAL supplier (no phantom FK) and, with
        # 4 stride-1 keys per part over >= 4 suppliers, every
        # supplier must stock at least one part.
        assert 0 <= lo and hi <= n_supp - 1
        supp = load_table(spark, SF_SMALL, "supplier").select("s_suppkey")
        orphans = ps.join(
            supp, ps.ps_suppkey == supp.s_suppkey, "left_anti"
        ).count()
        assert orphans == 0, f"{orphans} partsupp rows reference no supplier"
        unstocked = supp.join(
            ps, supp.s_suppkey == ps.ps_suppkey, "left_anti"
        ).count()
        assert unstocked == 0, f"{unstocked} suppliers stock nothing"
        assert 1 <= alo and ahi <= 9999
        assert 100 <= clo and chi <= 99999
    finally:
        ps.unpersist()


def test_q2_decorrelated_min_is_one_exchange(spark):
    """Q2's min-cost-per-part must be the window decorrelation: all
    four dimension joins broadcast and the ONLY hash exchange is the
    p_partkey window partitioning (plus the top-100 singleton sort)."""
    from weatherflow_spark.plans.tpch_ps import q_tpch_q2

    plan = _plan(q_tpch_q2(spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("Exchange hashpartitioning") <= 1


def test_q9_filters_part_before_lineitem_join(spark):
    """Q9 must pre-reduce partsupp by the broadcast name-filtered
    part BEFORE lineitem joins it — the name predicate must appear
    pushed at the part scan, not post-join."""
    from weatherflow_spark.plans.tpch_ps import q_tpch_q9

    df = q_tpch_q9(spark, SF_SMALL)
    formatted = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    scan = [
        s for s in formatted.split("PushedFilters") if "p_name" in s.splitlines()[0]
    ]
    assert scan, "p_name contains-filter did not reach the part scan"


def test_q12_pushes_shipdate_range(spark):
    """Q12's year window is a shipdate range predicate and must reach
    the lineitem parquet scan (the derived shipmode column must not
    block pushdown of the scan-side filters)."""
    from weatherflow_spark.plans.tpch_ps import q_tpch_q12

    df = q_tpch_q12(spark, SF_SMALL)
    formatted = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in formatted
    assert any(
        "l_shipdate" in s.splitlines()[0]
        for s in formatted.split("PushedFilters")[1:]
    )


def test_q16_exclusion_filters_are_not_vacuous(spark):
    """r10 ADVICE audit: Q16's brand/type exclusions must each remove
    rows from the size-filtered part set at every SF, or the query's
    NOT-EQUAL pushdown shape would be certified against an empty
    predicate (the f2f8116 vacuous-brand-filter class). Verified
    against the generated domains: Brand#15 and PROMO both occur
    inside the Q16_SIZES subset (sf0.001: 2 and 4 parts; sf0.1: 120
    and 567)."""
    from pyspark.sql import functions as F

    from weatherflow_spark.io import load_table
    from weatherflow_spark.plans.tpch_ps import Q16_SIZES

    part = load_table(spark, SF_SMALL, "part").where(
        F.col("p_size").isin(Q16_SIZES)
    )
    n_all = part.count()
    n_brand = part.where(F.col("p_brand") != "Brand#15").count()
    n_type = part.where(F.col("p_type") != "PROMO").count()
    assert 0 < n_brand < n_all, "Brand#15 exclusion removed nothing"
    assert 0 < n_type < n_all, "PROMO exclusion removed nothing"


def test_derived_commit_receipt_invariants(spark):
    """r10 (VERDICT r9 #6): the derived l_commitdate/l_receiptdate
    columns must satisfy dbgen's shape — receipt strictly after ship
    (1..30 days), commit within ship-10..ship+50 — and the three
    lateness predicates Q4/Q12/Q21 now exercise must each be
    NON-vacuous and NON-total (they remove some rows and keep some)."""
    from pyspark.sql import functions as F

    from weatherflow_spark.io import load_table
    from weatherflow_spark.plans.tpch import with_commit_receipt

    li = with_commit_receipt(
        load_table(spark, SF_SMALL, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_shipdate"
        )
    )
    ship = F.col("l_shipdate").cast("date")
    n = li.count()
    assert n > 0
    assert li.where(F.col("l_receiptdate") <= ship).count() == 0
    assert (
        li.where(F.datediff(F.col("l_receiptdate"), ship) > 30).count() == 0
    )
    assert (
        li.where(F.datediff(F.col("l_commitdate"), ship) < -10).count() == 0
    )
    assert (
        li.where(F.datediff(F.col("l_commitdate"), ship) > 50).count() == 0
    )
    for pred in (
        F.col("l_commitdate") < F.col("l_receiptdate"),  # Q4/Q12 lateness
        F.col("l_receiptdate") > F.col("l_commitdate"),  # Q21 lateness
        ship < F.col("l_commitdate"),  # Q12 shipped-before-commit
    ):
        kept = li.where(pred).count()
        assert 0 < kept < n, f"predicate {pred} vacuous or total: {kept}/{n}"
