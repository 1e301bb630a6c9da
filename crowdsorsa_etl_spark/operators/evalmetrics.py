"""N-gram evaluation metrics — BLEU and ROUGE over (candidate, reference)
pairs at corpus scale.

North-star surface (nothing like it in the reference): the EVAL side of a
training pipeline — scoring model generations against references, or
measuring how closely a filtered corpus tracks a target corpus — is the
same distributed n-gram machinery as the dedup tier, pointed at pairs.

Semantics (the standard definitions):

* **Modified n-gram precision** (BLEU, Papineni 2002): per pair, each
  candidate n-gram's count is CLIPPED at its reference count;
  p_n = clipped_matches / cand_ngrams.
* **Sentence BLEU-2** = BP · exp(½ ln p₁ + ½ ln p₂), with brevity
  penalty BP = exp(min(0, 1 − r/c)); pairs with zero matched bigrams
  score 0 (no smoothing — the convention DuckDB can replay exactly).
* **ROUGE-N** (Lin 2004): recall = clipped_matches / ref_ngrams,
  precision = clipped_matches / cand_ngrams, F1 their harmonic mean
  (0 where both are 0).

Scale shape: candidate and reference sides each explode to (pair_id,
ngram, cnt) count tables — two corpus-keyed shuffles with map-side
combine — then ONE equi-join on (pair_id, ngram) computes clipped
matches, and a per-pair aggregation folds the metric. Nothing is ever
quadratic; the join is keyed by pair, so AQE handles skewed pair sizes.

Float parity: all counts are exact BIGINTs; each metric is one closed-form
double expression over them, evaluated identically by both engines (same
division, ln, exp on identical inputs), rounded to 6 dp at the end only —
no cross-row float summation exists to reorder (the only sums are integer
count sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.functions.text import normalize_text


def _ngram_counts(
    df: DataFrame, n: int, *, pair_col: str, text_col: str, side: str
) -> DataFrame:
    """(pair_id, ng, {side}_cnt) word n-gram counts of one side."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    if n == 1:
        grams = toks
    else:
        a = toks
        grams = F.when(
            F.size(a) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(a) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(a, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(pair_col).alias("pair_id"), F.explode(grams).alias("ng"))
        .groupBy("pair_id", "ng")
        .agg(F.count(F.lit(1)).cast("bigint").alias(f"{side}_cnt"))
    )


def _clipped(
    cands: DataFrame, refs: DataFrame, n: int, *, pair_col: str, text_col: str
) -> DataFrame:
    """(pair_id, cand_ngrams, ref_ngrams, matched) for order n."""
    c = _ngram_counts(cands, n, pair_col=pair_col, text_col=text_col, side="c")
    r = _ngram_counts(refs, n, pair_col=pair_col, text_col=text_col, side="r")
    joined = c.join(r, ["pair_id", "ng"], "full_outer")
    return joined.groupBy("pair_id").agg(
        F.sum(F.coalesce("c_cnt", F.lit(0))).cast("bigint").alias("cand_ngrams"),
        F.sum(F.coalesce("r_cnt", F.lit(0))).cast("bigint").alias("ref_ngrams"),
        F.sum(
            F.least(
                F.coalesce("c_cnt", F.lit(0)), F.coalesce("r_cnt", F.lit(0))
            )
        )
        .cast("bigint")
        .alias("matched"),
    )


def bleu2_pairs(
    cands: DataFrame,
    refs: DataFrame,
    *,
    pair_col: str = "pair_id",
    text_col: str = "text",
) -> DataFrame:
    """(pair_id, c_len, r_len, p1, p2, bp, bleu2) per pair, 6 dp."""
    u = _clipped(cands, refs, 1, pair_col=pair_col, text_col=text_col)
    b = _clipped(cands, refs, 2, pair_col=pair_col, text_col=text_col)
    u = u.select(
        "pair_id",
        F.col("cand_ngrams").alias("c_len"),
        F.col("ref_ngrams").alias("r_len"),
        F.col("matched").alias("m1"),
    )
    b = b.select(
        "pair_id",
        F.col("cand_ngrams").alias("c2"),
        F.col("matched").alias("m2"),
    )
    j = u.join(b, "pair_id")
    p1 = F.when(F.col("c_len") > 0, F.col("m1") / F.col("c_len")).otherwise(
        F.lit(0.0)
    )
    p2 = F.when(F.col("c2") > 0, F.col("m2") / F.col("c2")).otherwise(
        F.lit(0.0)
    )
    bp = F.when(
        F.col("c_len") > 0,
        F.exp(
            F.least(F.lit(0.0), F.lit(1.0) - F.col("r_len") / F.col("c_len"))
        ),
    ).otherwise(F.lit(0.0))
    bleu = F.when(
        (F.col("m1") > 0) & (F.col("m2") > 0) & (F.col("c2") > 0),
        bp * F.exp(0.5 * F.log(p1) + 0.5 * F.log(p2)),
    ).otherwise(F.lit(0.0))
    return j.select(
        "pair_id",
        "c_len",
        "r_len",
        F.round(p1, 6).alias("p1"),
        F.round(p2, 6).alias("p2"),
        F.round(bp, 6).alias("bp"),
        F.round(bleu, 6).alias("bleu2"),
    )


def rouge_pairs(
    cands: DataFrame,
    refs: DataFrame,
    n: int,
    *,
    pair_col: str = "pair_id",
    text_col: str = "text",
) -> DataFrame:
    """(pair_id, matched, cand_ngrams, ref_ngrams, recall, precision, f1)
    for ROUGE-N, 6 dp; F1 is 0 where nothing matched."""
    c = _clipped(cands, refs, n, pair_col=pair_col, text_col=text_col)
    rec = F.when(
        F.col("ref_ngrams") > 0, F.col("matched") / F.col("ref_ngrams")
    ).otherwise(F.lit(0.0))
    prec = F.when(
        F.col("cand_ngrams") > 0, F.col("matched") / F.col("cand_ngrams")
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        F.col("matched") > 0, 2 * rec * prec / (rec + prec)
    ).otherwise(F.lit(0.0))
    return c.select(
        "pair_id",
        "matched",
        "cand_ngrams",
        "ref_ngrams",
        F.round(rec, 6).alias("recall"),
        F.round(prec, 6).alias("precision"),
        F.round(f1, 6).alias("f1"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle fragments. ``cand_sql`` / ``ref_sql`` must select
# (pair_id, text).
# ---------------------------------------------------------------------------


def _counts_sql(src_cte: str, n: int, norm_col: str = "text") -> str:
    if n == 1:
        grams = f"unnest(string_split({norm_col}, ' '))"
        return f"""
      SELECT pair_id, ng, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT pair_id, {grams} AS ng FROM {src_cte})
      GROUP BY pair_id, ng
        """
    return f"""
      SELECT pair_id, ng, CAST(count(*) AS BIGINT) AS cnt
      FROM (
        SELECT pair_id,
               array_to_string(arr[i : i + {n} - 1], ' ') AS ng
        FROM (SELECT pair_id, string_split({norm_col}, ' ') AS arr
              FROM {src_cte}),
             UNNEST(range(1, len(arr) - {n} + 2)) AS t(i)
      )
      GROUP BY pair_id, ng
        """


def clipped_sql(n: int) -> str:
    """CTE body producing (pair_id, cand_ngrams, ref_ngrams, matched) for
    order ``n`` from CTEs ``cand``/``ref`` with (pair_id, text)."""
    return f"""
      SELECT pair_id,
             CAST(sum(coalesce(c.cnt, 0)) AS BIGINT) AS cand_ngrams,
             CAST(sum(coalesce(r.cnt, 0)) AS BIGINT) AS ref_ngrams,
             CAST(sum(least(coalesce(c.cnt, 0), coalesce(r.cnt, 0)))
               AS BIGINT) AS matched
      FROM ({_counts_sql("cand", n)}) c
      FULL OUTER JOIN ({_counts_sql("ref", n)}) r USING (pair_id, ng)
      GROUP BY pair_id
    """
