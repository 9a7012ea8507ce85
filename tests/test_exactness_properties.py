"""Property-based tests (hypothesis) for the exact-integer identities the
round-7 waves rely on.  These exercise the MATH, not Spark: each property
re-states a formula the Spark/DuckDB twins share and checks it against a
brute-force or floating-point definition over randomized inputs — the
failure modes fixed-fixture tests can miss (ties, signs, boundary ranks,
truncation edges).

- doubled-midrank Pettitt identity: U_t = Σ_{i≤t}(2·midrank_i − (n+1))
  equals the definitional double-loop Σ sgn(x_i − x_j) for EVERY t,
  under arbitrary ties (plans/analytics_robust.py).
- sign-split truncating division: the catalog's
  ``CASE WHEN n >= 0 THEN n div d ELSE -((-n) div d)`` equals rational
  truncation toward zero — the convention that keeps Spark's ``div``
  and DuckDB's ``//`` identical on signed numerators.
- two-phase bucket-prefix rank: bucket histogram + in-bucket rank
  reproduces the global sort rank exactly, for any bucket width ≥ 1
  (the ABC / decile-lift / histogram-quantile backbone).
- octave-interpolated log2: the transcendental-free
  (len−1) + (f−2^(len−1))/2^(len−1) approximation stays within its
  documented 0.0861-bit error bound (corpus_zipf_alpha).
- Welch t² ppm pipeline vs floats: the decimal(38) truncation chain
  tracks the floating-point statistic to relative 1e-3 whenever the
  statistic is not degenerate (plans/analytics_robust.py).
- Bowley skewness stays inside ±1e6 ppm; nearest-rank quartiles are
  monotone (plans/analytics_robust.py).
- TVD over truncated ppm shares is symmetric and bounded by 1e6
  (plans/analytics_profiles.py).
"""

import math
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


def _signed_div(num: int, den: int) -> int:
    return num // den if num >= 0 else -((-num) // den)


# ---------------------------------------------------------------------------
# Pettitt doubled-midrank identity
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-5, max_value=5), min_size=2, max_size=25))
def test_pettitt_midrank_identity(xs):
    n = len(xs)
    svals = sorted(xs)
    r2 = {}
    for v in set(xs):
        below = sum(1 for w in svals if w < v)
        t = svals.count(v)
        r2[v] = 2 * below + t + 1
    u_ladder = 0
    for t_idx in range(1, n + 1):
        u_ladder += r2[xs[t_idx - 1]] - (n + 1)
        u_brute = sum(
            (0 if xs[i] == xs[j] else (1 if xs[i] > xs[j] else -1))
            for i in range(t_idx)
            for j in range(t_idx, n)
        )
        assert u_ladder == u_brute, (xs, t_idx)


# ---------------------------------------------------------------------------
# sign-split truncating division == truncation toward zero
# ---------------------------------------------------------------------------


@settings(max_examples=500, deadline=None)
@given(
    st.integers(min_value=-10**15, max_value=10**15),
    st.integers(min_value=1, max_value=10**9),
)
def test_sign_split_division_truncates_toward_zero(num, den):
    got = _signed_div(num, den)
    frac = Fraction(num, den)
    expected = math.floor(frac) if frac >= 0 else math.ceil(frac)
    assert got == expected


# ---------------------------------------------------------------------------
# two-phase bucket-prefix rank == global rank
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**6), st.integers()),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],
    ),
    st.integers(min_value=1, max_value=10**5),
)
def test_bucket_prefix_rank_equals_global_rank(rows, width):
    # rows: (value, id); rank by (value desc, id asc) — the ABC shape
    global_rank = {
        rid: i + 1
        for i, (_, rid) in enumerate(
            sorted(((v, rid) for v, rid in rows), key=lambda t: (-t[0], t[1]))
        )
    }
    from collections import defaultdict

    buckets: defaultdict = defaultdict(list)
    for v, rid in rows:
        buckets[v // width].append((v, rid))
    # revenue-above offset: count of rows in strictly HIGHER buckets
    two_phase = {}
    for bk, members in buckets.items():
        above = sum(
            len(m) for b2, m in buckets.items() if b2 > bk
        )
        for i, (_, rid) in enumerate(
            sorted(members, key=lambda t: (-t[0], t[1])), start=1
        ):
            two_phase[rid] = above + i
    assert two_phase == global_rank


# ---------------------------------------------------------------------------
# octave-interpolated log2 error bound
# ---------------------------------------------------------------------------


@settings(max_examples=500, deadline=None)
@given(st.integers(min_value=1, max_value=10**15))
def test_octave_log2_within_bound(f):
    lg = f.bit_length() - 1
    y_ppm = lg * 1_000_000 + ((f - (1 << lg)) * 1_000_000) // (1 << lg)
    true = math.log2(f)
    # linear-within-octave overestimates nowhere and underestimates by at
    # most 1 - (1 + ln ln 2) / ln 2 ≈ 0.0860713 bits (plus 1 ppm truncation)
    err = true - y_ppm / 1_000_000
    assert -1e-6 <= err <= 0.0860714 + 1e-6, (f, err)


# ---------------------------------------------------------------------------
# Welch t² exact-ppm chain vs floating point
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=8, max_size=40),
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=8, max_size=40),
)
def test_welch_ppm_chain_tracks_floats(a, b):
    n1, n2 = len(a), len(b)
    s1, s2 = sum(a), sum(b)
    q1 = sum(x * x for x in a)
    q2 = sum(x * x for x in b)
    if n1 * q1 == s1 * s1 or n2 * q2 == s2 * s2:
        return  # zero variance — t² undefined
    ar = ((n1 * q1 - s1 * s1) * 1_000_000) // (n1 * n1 * (n1 - 1))
    aa = ((n2 * q2 - s2 * s2) * 1_000_000) // (n2 * n2 * (n2 - 1))
    if ar + aa == 0:
        return
    num6 = ((s1 * n2 - s2 * n1) ** 2 * 1_000_000) // (n1 * n1 * n2 * n2)
    t2_ppm = num6 * 1_000_000 // (ar + aa)
    m1, m2 = s1 / n1, s2 / n2
    v1 = (q1 - n1 * m1 * m1) / (n1 - 1)
    v2 = (q2 - n2 * m2 * m2) / (n2 - 1)
    t2_float = (m1 - m2) ** 2 / (v1 / n1 + v2 / n2)
    if t2_float > 1e-3:
        assert abs(t2_ppm / 1e6 - t2_float) <= 1e-3 * t2_float + 2e-3


# ---------------------------------------------------------------------------
# Bowley bounds + quartile monotonicity
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=50))
def test_bowley_bounded(xs):
    xs.sort()
    n = len(xs)
    q1, q2, q3 = (xs[((q * (n - 1)) // 100 + 1) - 1] for q in (25, 50, 75))
    assert q1 <= q2 <= q3
    b = 0 if q3 == q1 else _signed_div((q3 + q1 - 2 * q2) * 1_000_000, q3 - q1)
    assert -1_000_000 <= b <= 1_000_000


# ---------------------------------------------------------------------------
# TVD symmetry and bound over truncated ppm shares
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=2, max_size=16),
    st.lists(st.integers(min_value=0, max_value=1000), min_size=2, max_size=16),
)
def test_tvd_symmetric_and_bounded(p, q):
    k = min(len(p), len(q))
    p, q = p[:k], q[:k]
    n1, n2 = sum(p) or 1, sum(q) or 1
    diffs = [
        abs(p[i] * 1_000_000 // n1 - q[i] * 1_000_000 // n2) for i in range(k)
    ]
    tvd = sum(diffs) // 2
    diffs_rev = [
        abs(q[i] * 1_000_000 // n2 - p[i] * 1_000_000 // n1) for i in range(k)
    ]
    assert tvd == sum(diffs_rev) // 2  # symmetric
    assert 0 <= tvd <= 1_000_000
