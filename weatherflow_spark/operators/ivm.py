"""Incremental view maintenance for additive aggregates (E92): keep a
downstream aggregate current from the E91 change feed — the facts are
never rescanned.

The reference recomputes every aggregate by re-reading its MySQL fact
tables wholesale (reference dags/etl.py load tier); at 100 TB the
steady-state cost of a dashboard aggregate must instead be
O(|changes|), the classic delta-maintenance result (self-maintainable
views over insert/update/delete feeds). This module is the engine's
delta-apply primitive:

    new_agg = combine(old_agg, +agg(U_new), -agg(U_old), -agg(D_old))

- ``plus``  = the feed's U rows (their NEW values enter the groups),
- ``minus`` = the OLD rows being displaced: the feed's D tombstones
  (they carry the old row by the CDC contract) plus the pre-image of
  every changed key, which the caller reads from the OLD version's
  retention mirror — pruned first to the feed's touched PARTITIONS
  (that bounds bytes read; CDC batches touch few partitions by
  contract), then to the changed keys via a broadcast semi-join
  (that bounds rows kept). The table is never fully rescanned in
  the steady state. PRUNING CONTRACT: partition-pruning the
  pre-image read by the feed's partition values is valid ONLY when a
  key's partition never changes between versions (the usual CDC
  contract — partitions are event dates or stable categories). A
  feed that MOVES keys across partitions carries only the NEW
  partition in its U rows, so the prune would miss the pre-image in
  the old partition and the old group would keep a row it lost —
  for such feeds, widen the prune with the keys' old partitions or
  skip it. ``delta_update_agg`` itself is prune-agnostic: given the
  full pre-images it handles group moves by construction.

Two measure kinds, both group-combinable without order sensitivity:

- ``("sum", expr)``: any integer-valued SUM (counts are ``sum(1)``,
  money is the scaled-integer cents pattern) — plus-side adds,
  minus-side subtracts.
- ``("xor", expr)``: BIT_XOR digests — xor is its own inverse, so
  plus and minus sides fold in identically.

Groups whose row count reaches zero are dropped, matching what a
direct re-aggregation would produce (no row for an empty group).
Non-decomposable aggregates (medians, distinct counts) are out of
scope by design — they need sketch state (E20/E24), not deltas.

Scale posture: one aggregation over the (small) delta frames + one
broadcast-able outer merge against the (|groups|-sized) old aggregate.
A group key change (a row "moving" between groups) needs no special
case: its pre-image subtracts from the old group, its new image adds
to the new one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def delta_update_agg(
    old_agg: DataFrame,
    plus: DataFrame,
    minus: DataFrame,
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
    count_col: str | None = None,
) -> DataFrame:
    """``old_agg`` refreshed by the delta frames (see module doc).

    ``measures`` maps output column → ``(kind, row_expr)`` with kind
    ``"sum"`` or ``"xor"``; ``row_expr`` is a SQL expression over one
    input row yielding a BIGINT. ``old_agg`` must carry exactly
    ``group_cols + list(measures)``. ``count_col`` names the measure
    that counts rows (a ``("sum", "1")`` entry); groups whose count
    reaches zero are dropped from the result.
    """
    for c in list(measures) + group_cols:
        if c not in old_agg.columns:
            raise ValueError(f"old_agg missing column {c}")

    def _delta(df: DataFrame, sign: int) -> DataFrame:
        aggs = []
        for name, (kind, expr) in measures.items():
            if kind == "sum":
                aggs.append(
                    F.sum(F.expr(f"cast({expr} as bigint)") * F.lit(sign))
                    .alias(name)
                )
            elif kind == "xor":
                # xor is self-inverse: the sign is irrelevant
                aggs.append(
                    F.expr(f"bit_xor(cast({expr} as bigint))").alias(name)
                )
            else:
                raise ValueError(f"unknown measure kind {kind!r}")
        return df.groupBy(*group_cols).agg(*aggs)

    deltas = _delta(plus, +1).unionByName(_delta(minus, -1))
    combined = old_agg.unionByName(deltas)
    merge_aggs = []
    for name, (kind, _expr) in measures.items():
        if kind == "sum":
            merge_aggs.append(F.sum(name).alias(name))
        else:
            merge_aggs.append(F.expr(f"bit_xor({name})").alias(name))
    out = combined.groupBy(*group_cols).agg(*merge_aggs)
    if count_col is not None:
        out = out.where(F.col(count_col) > 0)
    return out
