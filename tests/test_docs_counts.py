"""README/ARCHITECTURE must state the registry's actual size — stale
counts were flagged in two consecutive round verdicts, so the claim is
now asserted against the live registry."""

from __future__ import annotations

import os

from weatherflow_spark.plans import ORACLES, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_doc_counts_match_registry():
    nq, no = len(QUERIES), len(ORACLES)
    readme = open(os.path.join(REPO, "README.md")).read()
    arch = open(os.path.join(REPO, "ARCHITECTURE.md")).read()
    assert f"({nq} queries, {no} hash-matched" in readme, (
        f"README query counts stale (registry is {nq}/{no})"
    )
    assert f"{nq} registered queries; {no} hash-checked" in arch, (
        f"ARCHITECTURE query counts stale (registry is {nq}/{no})"
    )
