"""Set-similarity join (prefix filtering) and edit-distance join gates.

The load-bearing property is SOUNDNESS of the prefix filter: the prefix
join must return exactly the pairs the brute-force all-pairs join returns,
for awkward sizes (prefix length 1, sets of size 1, boundary thresholds).
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.operators.setsim import (
    editdist_join,
    setsim_prefix_join,
    shingle_sets,
    threshold_fraction,
)


def _brute_jaccard_pairs(rows, k, t):
    """Reference all-pairs jaccard over word k-shingle sets, pure python."""

    def sh(text):
        toks = " ".join(text.strip().lower().split()).split(" ")
        return {
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        } if len(toks) >= k else set()

    sets = {i: sh(t_) for i, t_ in rows}
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(sorted(sets.items()), 2):
        if not sa or not sb:
            continue
        c = len(sa & sb)
        if c and c / (len(sa) + len(sb) - c) >= t:
            out.add((ia, ib))
    return out


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (3, "completely different words entirely here now"),
    (4, "one two three"),  # exactly k tokens -> single shingle
    (5, "one two three"),  # its dup (jaccard 1 on singleton sets)
    (6, "two words"),  # fewer than k tokens -> empty set, never matches
    (7, "one two three four"),  # 2 shingles, shares 1 with doc 4
]


class TestSetSimJoin:
    @pytest.mark.parametrize("t", [0.3, 0.5, 0.8, 1.0])
    def test_matches_brute_force(self, spark, t):
        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        got = {
            (r.id_a, r.id_b)
            for r in setsim_prefix_join(df, threshold=t, shingle_k=3).collect()
        }
        assert got == _brute_jaccard_pairs(DOCS, 3, t)

    def test_boundary_pair_kept_exactly_at_threshold(self, spark):
        # doc 4 has 1 shingle, doc 7 has 2, intersection 1 -> jaccard 0.5:
        # must be kept at t=0.5 (integer math, no float wobble) and dropped
        # at any t just above
        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        at = setsim_prefix_join(df, threshold=0.5, shingle_k=3)
        pairs = {(r.id_a, r.id_b): r.jaccard for r in at.collect()}
        assert pairs[(4, 7)] == 0.5
        above = setsim_prefix_join(df, threshold=0.51, shingle_k=3)
        assert (5, 7) not in {(r.id_a, r.id_b) for r in above.collect()}
        assert (4, 7) not in {(r.id_a, r.id_b) for r in above.collect()}

    def test_short_docs_have_no_shingles(self, spark):
        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        ids = {r.id for r in shingle_sets(df, shingle_k=3).select("id").distinct().collect()}
        assert 6 not in ids
        got = setsim_prefix_join(df, threshold=0.1, shingle_k=3).collect()
        assert all(6 not in (r.id_a, r.id_b) for r in got)

    def test_exact_dup_reports_jaccard_one(self, spark):
        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        pairs = {
            (r.id_a, r.id_b): r.jaccard
            for r in setsim_prefix_join(df, threshold=0.9, shingle_k=3).collect()
        }
        assert pairs[(0, 2)] == 1.0

    def test_prefix_filter_reduces_candidates(self, spark):
        """On the fixture corpus the prefix join must inspect strictly fewer
        pairs than all-pairs — the point of the algorithm."""
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        n = docs.count()
        sh = shingle_sets(docs, shingle_k=3)
        # candidate pairs produced by a full-set equi-join (what a naive
        # implementation would do) vs the prefix join's verify input
        naive = (
            sh.alias("a")
            .join(
                sh.alias("b"),
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select("a.id", "b.id")
            .distinct()
            .count()
        )
        result = setsim_prefix_join(docs, threshold=0.5, shingle_k=3)
        assert result.count() <= naive
        assert naive < n * (n - 1) / 2  # sanity: equi-join itself beats all-pairs

    def test_threshold_fraction_exact(self):
        assert threshold_fraction(0.5) == (1, 2)
        assert threshold_fraction(0.8) == (4, 5)
        assert threshold_fraction(1.0) == (1, 1)
        with pytest.raises(ValueError):
            threshold_fraction(0.0)
        with pytest.raises(ValueError):
            threshold_fraction(1.2)

    def test_no_cartesian_in_plan(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = setsim_prefix_join(docs, threshold=0.5)._jdf.queryExecution().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestEditDistJoin:
    def test_finds_planted_typos(self, spark):
        rows = [
            (0, "the quick brown fox jumps over the lazy dog tonight again"),
            (1, "the quick brown fax jumps over the lazy dog tonight again"),  # 1 sub
            (2, "the quick brown fox jumps over the lazy dog tonight agains"),  # 1 ins
            (3, "a wholly unrelated sentence about distributed query engines"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            (r.id_a, r.id_b): r.dist
            for r in editdist_join(df, max_dist=3, bands=8, num_hashes=16).collect()
        }
        assert got[(0, 1)] == 1
        assert got[(0, 2)] == 1
        assert got[(1, 2)] == 2
        assert all(3 not in pair for pair in got)

    def test_length_filter_is_necessary_condition_only(self, spark):
        # identical prefix, big suffix insertion: length gap > max_dist
        rows = [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma delta " + "x" * 50),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        assert editdist_join(df, max_dist=6).count() == 0

    def test_matches_oracle_semantics_on_fixture(self, spark):
        """Same result as brute-force levenshtein on sf0.001."""
        import duckdb

        from crowdsorsa_etl_spark.lsh_oracles import editdist_join_sql

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in editdist_join(docs, max_dist=6).collect()
        }
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.001/documents.parquet'"
        )
        want = {
            (int(a), int(b), int(d))
            for a, b, d in con.sql(editdist_join_sql(6)).fetchall()
        }
        assert got == want


class TestSetsimSkewStress:
    """Adversarial hot-shingle vocabulary (round-8 verdict item): one
    boilerplate shingle shared by EVERY document — the shape that turns a
    naive shingle equi-join into ~n²/2 candidate pairs. The rarest-first
    canonical order must keep that shingle OUT of the prefixes, bounding
    fan-out, while recall stays exact."""

    HOT = "boiler plate words"

    def _corpus(self, spark, n=400):
        rows = []
        for i in range(n):
            rows.append(
                (i, f"u{i}a u{i}b u{i}c u{i}d u{i}e {self.HOT}")
            )
        # planted exact dup: the one pair the join must return
        rows.append((9000, rows[5][1]))
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_exact_recall_under_hot_shingle(self, spark):
        from crowdsorsa_etl_spark.operators.setsim import setsim_prefix_join

        docs = self._corpus(spark)
        got = {
            (r.id_a, r.id_b, r.jaccard)
            for r in setsim_prefix_join(
                docs, threshold=0.5, shingle_k=3
            ).collect()
        }
        # only the planted duplicate qualifies: every other pair shares at
        # most the 1 boilerplate shingle out of a ~11-shingle union
        assert got == {(5, 9000, 1.0)}

    def test_hot_shingle_never_enters_a_prefix(self, spark):
        """Replicate the operator's prefix rule over its own shingle table:
        at threshold 0.5 the prefix keeps the RAREST ceil(n/2)+1 shingles
        of each doc, and the 1000x-hot boilerplate shingle ranks LAST in
        every doc — so the hot key contributes ZERO equi-join pairs, which
        is the entire scale argument for rarest-first ordering."""
        from pyspark.sql import Window

        from crowdsorsa_etl_spark.operators.setsim import (
            shingle_sets,
            threshold_fraction,
        )

        docs = self._corpus(spark)
        p, q = threshold_fraction(0.5)
        sh = shingle_sets(docs, shingle_k=3)
        ranked = (
            sh.withColumn(
                "gfreq", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
            )
            .withColumn(
                "pos",
                F.row_number().over(
                    Window.partitionBy("id").orderBy("gfreq", "shingle")
                ),
            )
            .withColumn("sz", F.count(F.lit(1)).over(Window.partitionBy("id")))
        )
        prefix = ranked.filter(
            F.col("sz") * p <= (F.col("sz") - F.col("pos") + 1) * q
        )
        hot_in_prefix = prefix.filter(F.col("shingle") == self.HOT).count()
        assert hot_in_prefix == 0
        # fan-out bound: total candidate pairs from the prefix equi-join
        # stay linear-ish (the planted dup pair only), not ~n²/2 = 80k
        a, b = prefix.alias("a"), prefix.alias("b")
        cand = a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        ).count()
        assert cand <= 20

    def test_naive_join_would_blow_up(self, spark):
        """Sanity check that the fixture really is adversarial: WITHOUT the
        prefix filter, the raw shingle equi-join on this corpus is ~n²/2
        pairs — the blowup the canonical order prevents."""
        from crowdsorsa_etl_spark.operators.setsim import shingle_sets

        docs = self._corpus(spark)
        sh = shingle_sets(docs, shingle_k=3)
        a, b = sh.alias("a"), sh.alias("b")
        naive = a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        ).count()
        assert naive > 50_000  # 401 docs sharing one shingle → ~80k pairs
