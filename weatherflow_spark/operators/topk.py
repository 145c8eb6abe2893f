"""Two-phase per-group top-k: trim before you shuffle.

The idiomatic per-group top-k (`row_number() OVER (PARTITION BY key
ORDER BY ...) <= k`, plans/stats.q_top_n_per_group) shuffles EVERY
input row into the ranking window. Correct, but at 100 TB the shuffle
is the whole cost — of which all but k rows per (key, input-partition)
are discarded after ranking.

This operator runs the classic two-phase form:

  phase 1: inside each *input* partition, keep only the local top-k
           per key — an Arrow ``mapInPandas`` with bounded state
           (≤ |keys|·k rows per partition), no shuffle, no Python
           row-at-a-time work;
  phase 2: the exact window idiom over the survivors — the shuffle
           now carries ≤ partitions·k rows per key instead of every
           row.

Result-identical to the single-window form whenever the ordering is
total (break ties with a unique column), which is exactly the engine's
determinism rule for every ranked query — asserted against the window
idiom in tests/test_scale_ops.py and hash-checked against the plain
window SQL by the ``q_grouped_topk`` oracle (plans/stats.py).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window, functions as F


def _make_local_topk(key_cols: list[str], order_cols: list[str],
                     ascending: list[bool], k: int):
    """Closure-built (pickles by value) partition-local trimmer:
    accumulates at most k rows per key across the partition's Arrow
    batches."""

    def local_topk(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        # NULL order values must sort exactly where Spark's window
        # puts them (asc() = NULLS FIRST, desc() = NULLS LAST) or the
        # local trim could evict a row the window would keep. pandas
        # sort_values has only a single na_position for all columns,
        # so sort on an explicit isna flag ahead of each order column:
        # NULLS FIRST = flag descending (True first) = ascending False.
        sort_cols: list[str] = []
        sort_asc: list[bool] = []
        flags: list[str] = []
        for c, a in zip(order_cols, ascending):
            flag = f"__isna_{c}"
            flags.append(flag)
            sort_cols += [flag, c]
            sort_asc += [not a, a]

        state: "pd.DataFrame | None" = None
        for pdf in batches:
            state = pdf if state is None else pd.concat([state, pdf])
            for c, flag in zip(order_cols, flags):
                state[flag] = state[c].isna()
            # trim after every batch so state stays ≤ |keys|·k rows;
            # dropna=False keeps NULL-keyed groups (the window ranks
            # a NULL group like any other).
            state = (
                state.sort_values(sort_cols, ascending=sort_asc, kind="mergesort")
                .groupby(key_cols, sort=False, dropna=False)
                .head(k)
                .drop(columns=flags)
            )
        if state is not None and len(state):
            yield state

    return local_topk


def grouped_topk(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    k: int,
    ascending: bool | list[bool] = False,
) -> DataFrame:
    """Top-k rows per key group, two-phase. ``order_cols`` must form a
    total order (end with a unique tiebreak column) — the same rule
    every hash-checked ranked query in this engine follows; with ties
    left unbroken the two phases could keep different (equally valid)
    rows. NULLs follow Spark window semantics exactly: a NULL key is a
    group of its own, and NULL order values rank NULLS FIRST under
    ``asc`` / NULLS LAST under ``desc`` (the phase-1 trimmer mirrors
    this, so nullable inputs are safe). Output columns = input columns
    + ``rank`` (1-based)."""
    asc = [ascending] * len(order_cols) if isinstance(ascending, bool) else list(ascending)
    trimmed = df.mapInPandas(
        _make_local_topk(key_cols, order_cols, asc, k), schema=df.schema
    )
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).asc() if a else F.col(c).desc() for c, a in zip(order_cols, asc)]
    )
    return trimmed.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
