"""Bloom-filter semi-join pruning: transparency + effectiveness."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from weatherflow_spark.io import load_table
from weatherflow_spark.operators.bloom import (
    BLOOM_K,
    bloom_prune,
    build_bloom,
    might_contain_expr,
)

M_BITS = 1 << 14


def test_bloom_no_false_negatives(spark):
    """Every key actually present in the dim passes the filter."""
    orders = load_table(spark, SF_SMALL, "orders")
    dim = orders.where(F.col("o_totalprice") > 400000.0).select("o_orderkey")
    words = build_bloom(dim, "o_orderkey", M_BITS)
    rejected = dim.where(
        ~F.expr(might_contain_expr("o_orderkey", words, M_BITS))
    ).count()
    assert rejected == 0


def test_bloom_prune_transparent_and_effective(spark):
    """Pruned-then-joined result equals the unpruned join; the filter
    rejects a large majority of non-matching fact rows."""
    orders = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem")
    dim = orders.where(F.col("o_totalprice") > 400000.0).select("o_orderkey")

    pruned = bloom_prune(li, dim, "l_orderkey", "o_orderkey", M_BITS)
    exact = li.join(dim, li["l_orderkey"] == dim["o_orderkey"], "left_semi")
    with_bloom = pruned.join(dim, pruned["l_orderkey"] == dim["o_orderkey"], "left_semi")

    exact_rows = {r["l_orderkey"] for r in exact.select("l_orderkey").collect()}
    bloom_rows = {r["l_orderkey"] for r in with_bloom.select("l_orderkey").collect()}
    assert bloom_rows == exact_rows

    total = li.count()
    passed = pruned.count()
    matches = exact.count()
    # all true matches survive, and the pass-through is close to the
    # true match count (FP rate for n keys, k=4, m=2^14 is tiny here)
    assert passed >= matches
    assert passed < total * 0.5
    non_matching = total - matches
    false_pos = passed - matches
    assert false_pos <= max(50, non_matching * 0.05)


def test_bloom_word_bound(spark):
    """The build collect is bounded by the bitmap size, not the data."""
    orders = load_table(spark, SF_SMALL, "orders")
    words = build_bloom(orders, "o_orderkey", M_BITS)
    assert len(words) == M_BITS // 64
    # with n*k insertions the bitmap is non-trivially populated
    assert sum(bin(w & ((1 << 64) - 1)).count("1") for w in words) > 0
    assert BLOOM_K == 4
