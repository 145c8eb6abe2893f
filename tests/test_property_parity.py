"""Property-based cross-engine parity for the determinism primitives.

Every hash-checked query rests on a handful of shared expression
builders (the char-fold polynomial hash, shingles, tokenization,
half-up rounding, the sign-LSH bucket). The oracle harness exercises
them on the fixed testdata; these hypothesis tests exercise them on
ADVERSARIAL random inputs — short strings, repeated spaces, negative
and tiny doubles — asserting Spark and DuckDB produce bit-identical
results for arbitrary data, not just the corpus we happen to ship.

Examples are batched per hypothesis case (one Spark job evaluates the
whole list) so the suite stays fast.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

# Corpus-realistic character set; intentionally includes punctuation
# and digits. (Both engines are codepoint-identical on ASCII; the
# corpus generator emits ASCII.)
_CHARS = st.sampled_from(list("abcdefghijklmnopqrstuvwxyz0123456789 .,!?-'"))
_TEXT = st.text(alphabet=_CHARS, min_size=0, max_size=60)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _duck(pdf: pd.DataFrame, sql: str) -> list:
    con = duckdb.connect()
    try:
        con.register("t", pdf)
        return [r[0] for r in con.sql(sql).fetchall()]
    finally:
        con.close()


@_SETTINGS
@given(st.lists(_TEXT, min_size=1, max_size=24))
def test_char_fold_hash_cross_engine(spark, texts):
    from weatherflow_spark.functions.text import (
        _tok_hash_lambda_duck,
        _tok_hash_lambda_spark,
    )

    df = spark.createDataFrame([(t,) for t in texts], ["s"])
    got = [r.h for r in df.select(F.expr(_tok_hash_lambda_spark("s")).alias("h")).collect()]
    want = _duck(
        pd.DataFrame({"s": texts}),
        f"SELECT {_tok_hash_lambda_duck('s')} FROM t",
    )
    assert got == want


@_SETTINGS
@given(st.lists(_TEXT, min_size=1, max_size=24))
def test_tokens_cross_engine(spark, texts):
    from weatherflow_spark.functions.text import tokens_expr, tokens_sql

    df = spark.createDataFrame([(t,) for t in texts], ["s"])
    got = [r.a for r in df.select(F.expr(tokens_expr("s")).alias("a")).collect()]
    want = _duck(pd.DataFrame({"s": texts}), f"SELECT {tokens_sql('s')} FROM t")
    assert got == [list(w) for w in want]


@_SETTINGS
@given(st.lists(_TEXT, min_size=1, max_size=16))
def test_shingle_hashes_cross_engine(spark, texts):
    """Including the short-document edge (< n tokens -> empty array in
    BOTH engines — the guarded sequence() footgun)."""
    from weatherflow_spark.functions.text import (
        shingle_hashes_expr,
        shingle_hashes_sql,
    )

    df = spark.createDataFrame([(t,) for t in texts], ["s"])
    got = [
        r.a for r in df.select(F.expr(shingle_hashes_expr("s")).alias("a")).collect()
    ]
    want = _duck(
        pd.DataFrame({"s": texts}), f"SELECT {shingle_hashes_sql('s')} FROM t"
    )
    assert got == [list(w) for w in want]


@_SETTINGS
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=32,
    )
)
def test_round_half_up_cross_engine(spark, xs):
    from weatherflow_spark.functions.numeric import (
        round_half_up,
        round_half_up_sql,
    )

    df = spark.createDataFrame([(float(x),) for x in xs], ["x"])
    got = [r.r for r in df.select(round_half_up(F.col("x")).alias("r")).collect()]
    want = _duck(pd.DataFrame({"x": xs}), f"SELECT {round_half_up_sql('x')} FROM t")
    # bit-identical doubles, not approximate
    assert got == want


@_SETTINGS
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-10, max_value=10, allow_nan=False, allow_infinity=False
            ),
            min_size=4,
            max_size=16,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_lsh_bucket_cross_engine(spark, vecs):
    from weatherflow_spark.plans.ext_similarity import (
        lsh_bucket_expr,
        lsh_bucket_sql,
    )

    import pyspark.sql.types as PT

    schema = PT.StructType(
        [PT.StructField("v", PT.ArrayType(PT.DoubleType()))]
    )
    df = spark.createDataFrame([([float(x) for x in v],) for v in vecs], schema)
    got = [r.b for r in df.select(F.expr(lsh_bucket_expr("v")).alias("b")).collect()]
    want = _duck(
        pd.DataFrame({"v": [list(map(float, v)) for v in vecs]}),
        f"SELECT {lsh_bucket_sql('v')} FROM t",
    )
    assert got == want


@_SETTINGS
@given(
    st.lists(
        st.tuples(
            # epoch seconds 1990..2035 (covers leap days, century rule,
            # year boundaries) and UTC offsets -14h..+14h in minutes
            st.integers(min_value=631_152_000, max_value=2_051_222_400),
            st.integers(min_value=-840, max_value=840).map(lambda m: m * 60),
        ),
        min_size=1,
        max_size=32,
    )
)
def test_calendar_enrichment_cross_engine(spark, pairs):
    """F2/F4/F5 fidelity core on ADVERSARIAL instants: local-timestamp
    derivation, quarter and season labels identical between Spark's
    builders and the DuckDB oracle expressions for arbitrary epochs
    and any real-world UTC offset."""
    from weatherflow_spark.functions.calendar import (
        epoch_to_local_ts,
        quarter_bucket,
        season_bucket,
    )

    df = spark.createDataFrame(pairs, ["epoch_s", "tz_s"])
    local = epoch_to_local_ts(F.col("epoch_s"), F.col("tz_s"))
    got = [
        (str(r.l), r.q, r.s)
        for r in df.select(
            local.alias("l"),
            quarter_bucket(local).alias("q"),
            season_bucket(local).alias("s"),
        ).collect()
    ]
    con = duckdb.connect()
    try:
        con.register("t", pd.DataFrame(pairs, columns=["epoch_s", "tz_s"]))
        want = [
            (str(l), q, s)
            for l, q, s in con.sql(
                """
                SELECT make_timestamp((epoch_s + tz_s) * 1000000) AS l,
                       'Q' || CAST(quarter(make_timestamp((epoch_s + tz_s) * 1000000)) AS VARCHAR) AS q,
                       CASE WHEN month(make_timestamp((epoch_s + tz_s) * 1000000)) BETWEEN 3 AND 5 THEN 'Spring'
                            WHEN month(make_timestamp((epoch_s + tz_s) * 1000000)) BETWEEN 6 AND 8 THEN 'Summer'
                            WHEN month(make_timestamp((epoch_s + tz_s) * 1000000)) BETWEEN 9 AND 11 THEN 'Fall'
                            ELSE 'Winter' END AS s
                FROM t
                """
            ).fetchall()
        ]
    finally:
        con.close()
    assert got == want
