"""Property fuzz for the mergeable-sketch CONTRACTS (no Spark involved):
the guarantees sketch_quantiles_merge and sketch_heavy_hitters ship —
rank error ≤ N/k + S and true-count ∈ [est, upper] — are mathematical
claims about the constructions, so a pure-Python mirror of each
construction can hammer them with randomized data and shardings far
beyond what the fixture exercises. The Spark↔DuckDB value-hash parity
of the implementations is covered separately (oracles + test_approx);
this file guards the DESIGN."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

# mirrors _QSK_K / _HH_K scale-wise but varies in the fuzz
_VALUES = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    min_size=1,
    max_size=400,
)


def _quantile_summary_ref(values: list[float], k: int, s: int):
    """Pure-Python mirror of the per-shard rank summary + weighted merge
    (same keep rule: rank rn kept iff floor-div rn*k//ns increases)."""
    shards: dict[int, list[float]] = {}
    for i, v in enumerate(values):
        shards.setdefault(i % s, []).append(v)
    merged = []  # (value, weight)
    for vs in shards.values():
        vs = sorted(vs)
        ns = len(vs)
        prev_rank = 0
        for rn in range(1, ns + 1):
            if (rn * k) // ns > ((rn - 1) * k) // ns:
                merged.append((vs[rn - 1], rn - prev_rank))
                prev_rank = rn
    merged.sort(key=lambda t: t[0])
    total = sum(w for _, w in merged)
    assert total == len(values)  # exact merged count — by construction

    def quantile(p: float) -> float:
        target = math.ceil(p * total)
        cum = 0
        for v, w in merged:
            cum += w
            if cum >= target:
                return v
        return merged[-1][0]

    return quantile, total


@settings(max_examples=200, deadline=None)
@given(_VALUES, st.integers(1, 12), st.integers(1, 9), st.floats(0.01, 0.99))
def test_quantile_summary_rank_error_bound(values, k, s, p):
    quantile, total = _quantile_summary_ref(values, k, s)
    est = quantile(p)
    # with TIES the estimate occupies a RANGE of ranks
    # [count(<est)+1, count(<=est)] — the guarantee is that this range
    # intersects [target-bound, target+bound] (a plain count(<=est)
    # overcounts across a tie run; hypothesis found [0.0, 0.0, 0.0])
    lo_rank = sum(1 for v in values if v < est) + 1
    hi_rank = sum(1 for v in values if v <= est)
    target = math.ceil(p * total)
    bound = total // k + s
    assert lo_rank <= target + bound and hi_rank >= target - bound, (
        len(values), k, s, p, est, lo_rank, hi_rank, target, bound,
    )


_ITEMS = st.lists(st.integers(0, 30), min_size=1, max_size=500)


def _heavy_hitters_ref(items: list[int], k: int, s: int):
    """Pure-Python mirror of the per-shard top-k + threshold merge."""
    from collections import Counter

    shards: dict[int, list[int]] = {}
    for i, it in enumerate(items):
        shards.setdefault(i % s, []).append(it)
    est: dict[int, int] = {}
    present_thr: dict[int, int] = {}
    total_thr = 0
    for batch in shards.values():
        c = Counter(batch)
        ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        thr = ordered[k][1] if len(ordered) > k else 0
        total_thr += thr
        for item, cnt in ordered[:k]:
            est[item] = est.get(item, 0) + cnt
            present_thr[item] = present_thr.get(item, 0) + thr
    return {
        item: (e, e + total_thr - present_thr[item]) for item, e in est.items()
    }


@settings(max_examples=200, deadline=None)
@given(_ITEMS, st.integers(1, 8), st.integers(1, 7))
def test_heavy_hitters_bounds_contain_truth(items, k, s):
    from collections import Counter

    truth = Counter(items)
    got = _heavy_hitters_ref(items, k, s)
    for item, (est, upper) in got.items():
        assert est <= truth[item] <= upper, (item, est, truth[item], upper)
    # the overall top item is ALWAYS kept somewhere (it is in its own
    # shard's top-k whenever k >= 1 and it tops that shard... weaker but
    # useful: every item with a count > total_thr must be reported)
    total_thr = 0
    shards: dict[int, list[int]] = {}
    for i, it in enumerate(items):
        shards.setdefault(i % s, []).append(it)
    for batch in shards.values():
        c = Counter(batch)
        ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        total_thr += ordered[k][1] if len(ordered) > k else 0
    for item, cnt in truth.items():
        if cnt > total_thr:
            assert item in got, (item, cnt, total_thr)
