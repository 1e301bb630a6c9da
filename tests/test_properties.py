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


class TestChunkingProperty:
    @settings(**_SETTINGS)
    @given(
        texts=st.lists(
            st.lists(
                st.sampled_from(["alpha", "beta", "gamma", "delta"]),
                min_size=1,
                max_size=200,
            ),
            min_size=1,
            max_size=6,
        )
    )
    def test_chunks_cover_all_tokens_with_stride(self, spark, texts):
        """llm_doc_chunking's (64, 48) windows vs a python slicer: same
        chunk grid, same tail handling, same text reassembly."""
        from crowdsorsa_etl_spark.queries import QUERIES

        rows = [(i, " ".join(toks), "en", "src", len(" ".join(toks)))
                for i, toks in enumerate(texts)]
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            spark.createDataFrame(
                rows, "doc_id long, text string, lang string, source string,"
                " n_chars long"
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(d, "documents.parquet")
            )
            got = sorted(
                (r.doc_id, r.chunk_idx, r.start_token, r.n_tokens, r.chunk_text)
                for r in QUERIES["llm_doc_chunking"](spark, d).collect()
            )
        want = []
        for i, toks in enumerate(texts):
            n = len(toks)
            for ci, start in enumerate(range(0, n, 48)):
                sl = toks[start : start + 64]
                want.append((i, ci, start, len(sl), " ".join(sl)))
        assert got == sorted(want)


class TestBm25Property:
    @settings(**_SETTINGS)
    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from(["hash", "join", "scan", "filter", "agg"]),
                min_size=1,
                max_size=30,
            ),
            min_size=2,
            max_size=10,
        )
    )
    def test_matches_python_bm25(self, spark, docs):
        """The registered BM25 (k1=1.2, b=0.75, Lucene idf, round-before-
        sum) vs a python fold over the same corpus."""
        import math
        import os
        import tempfile

        from crowdsorsa_etl_spark.queries import QUERIES

        rows = [(i, " ".join(toks), "en", "src", 1)
                for i, toks in enumerate(docs)]
        with tempfile.TemporaryDirectory() as d:
            spark.createDataFrame(
                rows, "doc_id long, text string, lang string, source string,"
                " n_chars long"
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(d, "documents.parquet")
            )
            got = {
                (r.query_id, r.doc_id): (r.bm25, r.rank)
                for r in QUERIES["llm_bm25_topk"](spark, d).collect()
            }

        # python reference (same queries as the registered entry)
        queries = {1: ["hash", "join"], 2: ["window", "agg", "stream"],
                   3: ["slow", "scan", "filter"]}
        dls = {i: len(t) for i, t in enumerate(docs)}
        n_docs, avgdl = len(docs), sum(dls.values()) / len(docs)
        tf = {}
        for i, t in enumerate(docs):
            for tok in t:
                tf[(i, tok)] = tf.get((i, tok), 0) + 1
        df_t = {}
        for (i, tok), _ in tf.items():
            df_t[tok] = df_t.get(tok, 0) + 1
        want = {}
        for qid, terms in queries.items():
            scores = {}
            for i in range(len(docs)):
                c = 0.0
                for t in terms:
                    if (i, t) not in tf:
                        continue
                    idf = math.log(
                        1.0 + (float(n_docs) - df_t[t] + 0.5) / (df_t[t] + 0.5)
                    )
                    f = tf[(i, t)]
                    c += round(
                        idf * (f * 2.2)
                        / (f + 1.2 * (1.0 - 0.75 + 0.75 * dls[i] / avgdl)),
                        6,
                    )
                if c:
                    scores[i] = round(c, 6)
            ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
            for rank, (i, s) in enumerate(ranked[:10], 1):
                want[(qid, i)] = (s, rank)
        assert got == want


class TestWordPieceProperty:
    @settings(**_SETTINGS)
    @given(
        words=st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=6),
            min_size=1,
            max_size=12,
        ),
        n_merges=st.integers(min_value=1, max_value=6),
    )
    def test_encode_roundtrip_and_greedy_invariants(
        self, spark, words, n_merges
    ):
        """For any corpus, every word encodes WITHOUT [UNK] under its own
        corpus-derived vocabulary (the alphabet guarantees coverage), the
        pieces reassemble to the word exactly (strip '##', concatenate),
        only the first piece is bare, and a vocabulary word encodes to
        one piece only if that exact token is in the vocabulary."""
        from crowdsorsa_etl_spark.operators.wordpiece import (
            wordpiece_encode_words,
            wordpiece_learn,
            wordpiece_vocab,
        )

        docs = spark.createDataFrame(
            [(0, " ".join(words))], ["doc_id", "text"]
        )
        merges = wordpiece_learn(docs, n_merges=n_merges)
        vocab_df = wordpiece_vocab(docs, merges)
        vocab = {r["tok"] for r in vocab_df.collect()}
        got = {
            r["word"]: r["wp_tokens"].split(" ")
            for r in wordpiece_encode_words(docs, vocab_df).collect()
        }
        assert set(got) == set(words)
        for w, pieces in got.items():
            assert pieces and pieces != ["[UNK]"]
            # round-trip
            rebuilt = pieces[0] + "".join(p[2:] for p in pieces[1:])
            assert rebuilt == w
            # surface forms: bare head, '##' continuations, all in vocab
            assert not pieces[0].startswith("##")
            assert all(p.startswith("##") for p in pieces[1:])
            assert all(p in vocab for p in pieces)
            # greedy implies maximal head piece: no longer bare prefix of
            # w is in the vocabulary
            head = pieces[0]
            for ln in range(len(w), len(head), -1):
                assert w[:ln] not in vocab or ln == len(head)


class TestIncrementalComponentsProperty:
    @settings(**_SETTINGS)
    @given(
        edges=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=14),
                st.integers(min_value=0, max_value=14),
            ),
            min_size=1,
            max_size=24,
        ),
        cut=st.integers(min_value=0, max_value=24),
    )
    def test_any_batch_split_matches_one_shot(self, spark, edges, cut):
        """For ANY edge list and ANY split point, registry-folding the
        second batch into the first batch's components equals the
        one-shot CC over all edges (self-loops dropped by both paths)."""
        from crowdsorsa_etl_spark.operators.clusters import (
            connected_components,
            incremental_components,
        )

        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            return
        cut = min(cut, len(edges))
        b0, b1 = edges[:cut], edges[cut:]

        def df(rows):
            return spark.createDataFrame(rows, "id_a long, id_b long")

        if b0:
            reg = connected_components(df(b0))
        else:
            reg = spark.createDataFrame([], "id long, component long")
        if b1:
            reg = incremental_components(reg, df(b1))
        got = {(r["id"], r["component"]) for r in reg.collect()}
        want = {
            (r["id"], r["component"])
            for r in connected_components(df(edges)).collect()
        }
        assert got == want
