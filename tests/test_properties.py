"""Property-based tests (hypothesis): randomized inputs against reference
implementations — the naive single-partition window for global ranks, and
pandas merge_asof for the as-of join. Example counts are kept small because
each case runs Spark jobs."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.operators.asof import asof_join
from crowdsorsa_etl_spark.operators.global_rank import rank_distributions

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


class TestGlobalRankProperty:
    @settings(**_SETTINGS)
    @given(
        values=st.lists(st.integers(min_value=-5, max_value=5), min_size=1, max_size=120),
        parts=st.integers(min_value=1, max_value=9),
        ntile=st.integers(min_value=1, max_value=6),
    )
    def test_matches_naive_window(self, spark, values, parts, ntile):
        # heavy ties in v; k is the unique tie-breaker the contract requires
        rows = [(k, float(v)) for k, v in enumerate(values)]
        df = spark.createDataFrame(rows, "k long, v double")
        order = [F.col("v").asc(), F.col("k").asc()]
        got = {
            r.k: (r[2], r.pct_rank, r.cdist, r.rnk, r.drnk)
            for r in rank_distributions(
                df, order, ntile=ntile, num_partitions=parts
            ).collect()
        }
        w = Window.orderBy(*order)
        want = {
            r.k: (r.tile, r.pct_rank, r.cdist, r.rnk, r.drnk)
            for r in df.select(
                "k",
                F.ntile(ntile).over(w).alias("tile"),
                F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
                F.round(F.cume_dist().over(w), 6).alias("cdist"),
                F.rank().over(w).cast("int").alias("rnk"),
                F.dense_rank().over(w).cast("int").alias("drnk"),
            ).collect()
        }
        assert got == want


class TestAsofJoinProperty:
    @settings(**_SETTINGS)
    @given(
        left=st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 1000)),
            min_size=1,
            max_size=40,
        ),
        right=st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 1000)),
            min_size=1,
            max_size=40,
        ),
    )
    def test_matches_merge_asof(self, spark, left, right):
        base = dt.datetime(2024, 1, 1)
        left_rows = [
            (i, key, base + dt.timedelta(minutes=m)) for i, (key, m) in enumerate(left)
        ]
        # unique (key, rt) on the right: merge_asof's tie behavior at equal
        # timestamps differs from our max-tiebreak contract, which the
        # fixed-row unit test covers; dedup keeps the property comparable
        seen: set[tuple[int, int]] = set()
        right_rows = []
        for j, (key, m) in enumerate(right):
            if (key, m) not in seen:
                seen.add((key, m))
                right_rows.append((key, base + dt.timedelta(minutes=m), 100 + j))
        ldf = spark.createDataFrame(left_rows, "event_id long, key long, t timestamp")
        rdf = spark.createDataFrame(right_rows, "key long, rt timestamp, val long")
        got = {
            r.event_id: r.val
            for r in asof_join(
                ldf, rdf, on="key", left_time="t", right_time="rt",
                right_payload=["val"], tiebreak="val",
            ).collect()
        }
        lpdf = pd.DataFrame(left_rows, columns=["event_id", "key", "t"]).sort_values(
            ["t", "event_id"]
        )
        rpdf = pd.DataFrame(right_rows, columns=["key", "rt", "val"]).sort_values(
            ["rt", "val"]
        )
        want = pd.merge_asof(lpdf, rpdf, left_on="t", right_on="rt", by="key")
        for _, row in want.iterrows():
            expected = None if pd.isna(row.val) else int(row.val)
            assert got[row.event_id] == expected


class TestZValueNProperty:
    @settings(**_SETTINGS)
    @given(
        n_keys=st.integers(min_value=2, max_value=4),
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=255),
                st.integers(min_value=0, max_value=255),
                st.integers(min_value=0, max_value=255),
                st.integers(min_value=0, max_value=255),
            ),
            min_size=1,
            max_size=60,
        ),
    )
    def test_interleave_is_injective_and_matches_python(self, spark, n_keys, rows):
        """For in-range keys the n-ary Morton value is a bijection onto its
        bit pattern: distinct tuples → distinct z; and the column expression
        must equal a direct Python bit-interleave reference."""
        from crowdsorsa_etl_spark.operators.zorder import z_value_n

        bits = 8
        tuples = [r[:n_keys] for r in rows]
        df = spark.createDataFrame(
            [(i, *t) for i, t in enumerate(tuples)],
            "k long, " + ", ".join(f"c{j} int" for j in range(n_keys)),
        )
        got = {
            r.k: r.z
            for r in df.select(
                "k",
                z_value_n([F.col(f"c{j}") for j in range(n_keys)], bits).alias("z"),
            ).collect()
        }

        def ref(t):
            out = 0
            for i in range(bits):
                for j, v in enumerate(t):
                    out |= ((v >> i) & 1) << (i * n_keys + j)
            return out

        for i, t in enumerate(tuples):
            assert got[i] == ref(t)
        assert len(set(got.values())) == len(set(tuples))


class TestCombineCwProperty:
    @settings(**_SETTINGS)
    @given(
        rows=st.lists(
            st.tuples(
                st.one_of(st.none(), st.integers(min_value=0, max_value=(1 << 60) - 1)),
                st.one_of(st.none(), st.integers(min_value=0, max_value=(1 << 60) - 1)),
                st.one_of(st.none(), st.integers(min_value=0, max_value=(1 << 60) - 1)),
            ),
            min_size=1,
            max_size=50,
        ),
        seed=st.integers(min_value=0, max_value=7),
    )
    def test_spark_equals_duckdb_on_random_words(self, spark, rows, seed):
        """The polynomial combine's Spark column and DuckDB fragment must
        agree on arbitrary 60-bit words with arbitrary NULL patterns — the
        randomized extension of the edge-case lockstep tests."""
        import duckdb

        from crowdsorsa_etl_spark.functions.portable_hash import (
            combine_cw_spark,
            combine_cw_sql,
        )

        df = spark.createDataFrame(rows, "a long, b long, c long")
        got = [
            r.h
            for r in df.select(
                combine_cw_spark(F.col("a"), F.col("b"), F.col("c"), seed=seed).alias(
                    "h"
                )
            ).collect()
        ]
        vals = ", ".join(
            "({}, {}, {})".format(*("NULL" if v is None else v for v in row))
            for row in rows
        )
        want = [
            r[0]
            for r in duckdb.connect()
            .execute(
                f"SELECT {combine_cw_sql('a', 'b', 'c', seed=seed)}"
                f" FROM (VALUES {vals}) AS v(a, b, c)"
            )
            .fetchall()
        ]
        assert got == want


class TestScd2Property:
    @settings(**_SETTINGS)
    @given(
        log=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),   # key
                st.integers(min_value=0, max_value=20),  # ts offset
                st.sampled_from(["A", "B", "C", None]),  # tracked value
            ),
            min_size=1,
            max_size=60,
        )
    )
    def test_matches_python_reference(self, spark, log):
        """scd2_build vs a straight-line python fold: same versions, same
        intervals, same is_current — under ties (event_id breaks them),
        nulls, and arbitrary run structure."""
        from crowdsorsa_etl_spark.operators.scd import scd2_build

        rows = [
            (k, dt.datetime(2024, 1, 1) + dt.timedelta(hours=ts), v, i)
            for i, (k, ts, v) in enumerate(log)
        ]
        df = spark.createDataFrame(
            rows, "k long, ts timestamp, v string, eid long"
        )
        got = sorted(
            (r.k, r.version, r.v, r.valid_from, r.valid_to, r.is_current)
            for r in scd2_build(
                df, key_cols=["k"], ts_col="ts", tracked_cols=["v"],
                tie_break_cols=["eid"],
            ).collect()
        )

        want = []
        by_key: dict[int, list] = {}
        for k, ts, v, eid in rows:
            by_key.setdefault(k, []).append((ts, eid, v))
        for k, evs in by_key.items():
            evs.sort()
            versions = []
            prev = object()
            for ts, _eid, v in evs:
                if v != prev:
                    versions.append([ts, None, v])
                    prev = v
            for a, b in zip(versions, versions[1:]):
                a[1] = b[0]
            for n, (vf, vt, v) in enumerate(versions, 1):
                want.append((k, n, v, vf, vt, vt is None))
        assert got == sorted(want)


class TestSpatialJoinProperty:
    @settings(**_SETTINGS)
    @given(
        polys=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=40),  # cx
                st.integers(min_value=0, max_value=40),  # cy
                st.integers(min_value=1, max_value=12),  # half
            ),
            min_size=1,
            max_size=8,
        ),
        points=st.lists(
            st.tuples(
                st.integers(min_value=-5, max_value=45),
                st.integers(min_value=-5, max_value=45),
            ),
            min_size=1,
            max_size=15,
        ),
        cell=st.sampled_from([3.0, 10.0, 25.0]),
    )
    def test_matches_brute_force(self, spark, polys, points, cell):
        """grid_spatial_join vs all-pairs ray cast, any cell size. Integer
        coords + 0.5 offsets keep probe points off polygon edges (where
        ray-cast half-open semantics are representation-sensitive — out of
        the operator's contract)."""
        from crowdsorsa_etl_spark.functions.geo import (
            _contains_py,
            polygons_to_wkb,
        )
        from crowdsorsa_etl_spark.operators.spatial import grid_spatial_join

        def square(cx, cy, h):
            return [[(cx - h, cy - h), (cx + h, cy - h), (cx + h, cy + h),
                     (cx - h, cy + h), (cx - h, cy - h)]]

        gdf = spark.createDataFrame(
            [(f"P{i}", polygons_to_wkb([square(cx, cy, h)]))
             for i, (cx, cy, h) in enumerate(polys)],
            "poly_id string, geometry_wkb binary",
        )
        pdf = spark.createDataFrame(
            [(f"p{i}", x + 0.5, y + 0.5) for i, (x, y) in enumerate(points)],
            "point_id string, x double, y double",
        )
        got = {
            (r.point_id, r.poly_id)
            for r in grid_spatial_join(pdf, gdf, cell_size=cell).collect()
        }
        want = {
            (f"p{i}", f"P{j}")
            for i, (x, y) in enumerate(points)
            for j, (cx, cy, h) in enumerate(polys)
            if _contains_py(polygons_to_wkb([square(cx, cy, h)]), x + 0.5, y + 0.5)
        }
        assert got == want
