"""Property-based gates for the round-18 tier: the operators must agree
with slow, obviously-correct pure-Python references on ARBITRARY inputs
(hypothesis-generated), not just the fixture — the class of bug this
catches is a formula that happens to match on one data shape (even/odd
splits, a particular tie pattern) and silently diverges on another."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _kcore_py(edges: set[tuple[int, int]], k: int, rounds: int):
    """Reference fixed-round peel: synchronous, over the previous round's
    edge set."""
    sym = {(a, b) for a, b in edges if a != b}
    sym |= {(b, a) for a, b in sym}
    cur = set(sym)
    prev_len = None
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for a, _b in cur:
            deg[a] = deg.get(a, 0) + 1
        keep = {v for v, d in deg.items() if d >= k}
        prev_len = len(cur)
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
    fdeg: dict[int, int] = {}
    for a, _b in cur:
        fdeg[a] = fdeg.get(a, 0) + 1
    verts = {a for a, _b in sym}
    return (
        {v: fdeg.get(v, 0) for v in verts},
        len(cur) == prev_len,
    )


@_SET
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=30,
    ),
    k=st.integers(min_value=1, max_value=4),
)
def test_kcore_matches_reference_on_random_graphs(spark, edges, k):
    from crowdsorsa_etl_spark.operators.clusters import kcore_filter

    clean = [(a, b) for a, b in edges if a != b]
    if not clean:
        return
    df = spark.createDataFrame(clean, "id_a long, id_b long")
    got = {
        r["id"]: (r["core_deg"], r["in_core"], r["converged"])
        for r in kcore_filter(df, k=k, rounds=4).collect()
    }
    want_deg, want_conv = _kcore_py(set(clean), k, 4)
    assert set(got) == set(want_deg)
    for v, d in want_deg.items():
        assert got[v][0] == d, (v, got[v], d)
        assert got[v][1] == (d > 0)
        assert got[v][2] == want_conv


@_SET
@given(
    xs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=2,
        max_size=60,
    )
)
def test_ks_arithmetic_on_random_samples(spark, xs):
    """The KS integer form |cum_a*n_b - cum_b*n_a| / (n_a*n_b) equals the
    classic max-|ECDF difference| on arbitrary two-sample data."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    a = [v for s, v in xs if s == 0]
    b = [v for s, v in xs if s == 1]
    if not a or not b:
        return
    df = spark.createDataFrame(xs, "side int, v long")
    grid = df.groupBy("v").agg(
        F.count(F.when(F.col("side") == 0, 1)).cast("bigint").alias("ca"),
        F.count(F.when(F.col("side") == 1, 1)).cast("bigint").alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    dev = grid.select(
        (
            F.abs(
                F.sum("ca").over(w) * len(b) - F.sum("cb").over(w) * len(a)
            )
        ).alias("d")
    )
    d_num = dev.agg(F.max("d")).collect()[0][0]
    # reference: max |ECDF_a - ECDF_b| over the merged value grid
    best = 0.0
    ca = cb = 0
    for v in sorted(set(a) | set(b)):
        ca += a.count(v)
        cb += b.count(v)
        best = max(best, abs(ca / len(a) - cb / len(b)))
    assert abs(d_num / (len(a) * len(b)) - best) < 1e-12


@_SET
@given(
    counts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=1, max_value=40),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_robust_outlier_integer_form_equals_float_form(spark, counts):
    """4·d > 7·mad2 must decide exactly like |x − med|/MAD > 3.5 whenever
    MAD > 0 (the cleared-halves identity), on arbitrary integer data."""
    import statistics

    xs = sorted(v for _g, v in counts)
    n = len(xs)
    med2 = xs[(n - 1) // 2] + xs[n // 2]
    ds = sorted(abs(2 * x - med2) for x in xs)
    mad2 = ds[(n - 1) // 2] + ds[n // 2]
    med = statistics.median(xs)
    mad = statistics.median([abs(x - med) for x in xs])
    for x in xs:
        int_flag = 4 * abs(2 * x - med2) > 7 * mad2
        if mad > 0:
            float_flag = abs(x - med) / mad > 3.5
            assert int_flag == float_flag, (x, xs)
        else:
            # MAD == 0: the integer form flags any deviation at all
            assert int_flag == (abs(x - med) > 0)
