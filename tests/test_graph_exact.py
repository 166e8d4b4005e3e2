"""graph_triangles / graph_link_predict vs brute-force set arithmetic.

The DuckDB oracles run the SAME degree-oriented wedge algorithm in SQL,
so a shared algorithmic mistake (mis-oriented edge, double-counted
wedge, wrong Jaccard denominator) would hash-match anyway. These tests
recompute both operators from first principles — adjacency sets +
itertools over the actual fixture edge list — with none of the
orientation machinery, so they catch exactly the class of bug the
oracle cannot.
"""
from __future__ import annotations

from itertools import combinations

import duckdb

from cqlcopy_spark.operators.graph import (
    _LINK_PREDICT_CAP,
    _LINK_PREDICT_TOPN,
    graph_link_predict,
    graph_triangles,
)
from tests.conftest import SF_SMALL


def _edge_set(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT DISTINCT least(src, dst), greatest(src, dst) FROM (
          SELECT source AS src, 'src' || CAST(doc_id % 7 AS VARCHAR) AS dst
          FROM '{sf_dir}/documents.parquet'
          UNION ALL
          SELECT source, 'src' || CAST((doc_id * 13 + 5) % 20 AS VARCHAR)
          FROM '{sf_dir}/documents.parquet'
        ) WHERE src <> dst
        """
    ).fetchall()
    return {tuple(r) for r in rows}


def _adjacency(edges):
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def test_triangles_match_bruteforce(spark):
    edges = _edge_set(SF_SMALL)
    adj = _adjacency(edges)
    tri = {n: 0 for n in adj}
    for n, nbrs in adj.items():
        tri[n] = sum(1 for x, y in combinations(sorted(nbrs), 2) if y in adj[x])
    got = {r["node"]: r for r in graph_triangles(spark, SF_SMALL).collect()}
    assert set(got) == set(adj)
    for n in adj:
        d = len(adj[n])
        assert got[n]["degree"] == d, n
        assert got[n]["triangles"] == tri[n], n
        expect_c = (2.0 * tri[n]) / (d * (d - 1)) if d >= 2 else 0.0
        assert got[n]["clustering"] == expect_c, n
    # liveness: the synthetic graph genuinely contains triangles
    assert sum(tri.values()) > 0


def test_link_predict_matches_bruteforce(spark):
    edges = _edge_set(SF_SMALL)
    adj = _adjacency(edges)
    # fixture degrees must be under the cap, else the oracle-side and
    # this reference would both silently test the capped approximation
    assert max(len(v) for v in adj.values()) <= _LINK_PREDICT_CAP
    scored = []
    for x, y in combinations(sorted(adj), 2):
        if (x, y) in edges:
            continue
        cn = len(adj[x] & adj[y])
        if cn == 0:
            continue
        jac = cn / len(adj[x] | adj[y])
        scored.append((-jac, -cn, x, y))
    scored.sort()
    expect = [
        (x, y, -ncn, -njac) for njac, ncn, x, y in scored[:_LINK_PREDICT_TOPN]
    ]
    got = [
        (r["x"], r["y"], r["common_neighbors"], r["jaccard"])
        for r in graph_link_predict(spark, SF_SMALL).collect()
    ]
    assert got == expect
