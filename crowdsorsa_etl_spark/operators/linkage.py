"""Probabilistic record linkage — blocking + Fellegi–Sunter agreement
scoring.

North-star surface (the reference links nothing; its one join is an exact
municipality-code lookup, `crowdsorsa-etl-2023.R:52-53`): entity
resolution over dirty records — the same shape web-corpus metadata
reconciliation, author/source dedup, and user-record stitching need — is
blocking (cheap candidate generation, never all-pairs) followed by a
field-agreement likelihood score (Fellegi & Sunter 1969):

    score = Σ_f  agree_f ? log2(m_f / u_f) : log2((1-m_f) / (1-u_f))

where m_f = P(field f agrees | true match), u_f = P(agrees | non-match).
Pairs classify as match / possible / non-match by two thresholds.

Scale shape: ONE equi-join on the blocking key is the only data-sized
exchange — the classic linkage discipline (a hot blocking key is a data
bug, not an engine problem; AQE skew-split covers the rest). Agreement
tests and the weight fold are pure codegen expressions on the joined
row; no UDF, no driver traffic. m/u weights are literals (in production:
EM-estimated offline, shipped like model coefficients — the
_QC_WEIGHTS single-source-of-truth posture).

Float parity: every weight is a compile-time double literal; the score
is a fixed-length sum of literals selected by exact boolean tests,
identical on both engines; rounded to 6 dp for the hash gate.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fs_score(
    features: dict[str, Column], weights: dict[str, tuple[float, float]]
) -> Column:
    """Fellegi–Sunter log2-likelihood score from boolean agreement
    expressions and (m, u) probability pairs."""
    if set(features) != set(weights):
        raise ValueError(
            f"features/weights mismatch: {sorted(features)} vs "
            f"{sorted(weights)}"
        )
    total = F.lit(0.0)
    for name in sorted(features):
        m, u = weights[name]
        if not (0.0 < u < m < 1.0):
            raise ValueError(f"need 0 < u < m < 1 for {name}; got {(m, u)}")
        agree_w = math.log2(m / u)
        disagree_w = math.log2((1.0 - m) / (1.0 - u))
        total = total + F.when(features[name], F.lit(agree_w)).otherwise(
            F.lit(disagree_w)
        )
    return total


def fs_classify(
    score: Column, *, upper: float, lower: float
) -> Column:
    """match / possible / nonmatch by the two F-S thresholds."""
    return (
        F.when(score >= upper, F.lit("match"))
        .when(score >= lower, F.lit("possible"))
        .otherwise(F.lit("nonmatch"))
    )


def fs_link(
    left: DataFrame,
    right: DataFrame,
    *,
    block_on: list[str],
    features: dict[str, Column],
    weights: dict[str, tuple[float, float]],
    upper: float,
    lower: float,
) -> DataFrame:
    """Blocked candidate pairs with F-S scores and classifications.

    ``left``/``right`` must share the ``block_on`` column names; all other
    columns survive with their own names (caller aliases beforehand —
    linkage inputs are two different sources, so collisions are the
    caller's signal to rename). ``features`` are boolean expressions over
    the joined frame."""
    pairs = left.join(right, block_on)
    score = F.round(fs_score(features, weights), 6)
    return pairs.select(
        "*",
        score.alias("fs_score"),
        fs_classify(score, upper=upper, lower=lower).alias("fs_class"),
    )


def fs_weights_sql(
    features_sql: dict[str, str], weights: dict[str, tuple[float, float]]
) -> str:
    """SQL expression mirroring :func:`fs_score`: CASE per feature with
    the SAME python-computed literal weights (single source of truth —
    the oracle embeds repr() of the identical doubles)."""
    parts = []
    for name in sorted(features_sql):
        m, u = weights[name]
        parts.append(
            f"(CASE WHEN {features_sql[name]} THEN {math.log2(m / u)!r} "
            f"ELSE {math.log2((1.0 - m) / (1.0 - u))!r} END)"
        )
    return " + ".join(parts)


def fs_link_multipass(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str,
    right_id: str,
    block_passes: list[list[str]],
    features: dict[str, Column],
    weights: dict[str, tuple[float, float]],
    upper: float,
    lower: float,
) -> DataFrame:
    """Union-of-blocking-passes Fellegi–Sunter linkage — the production
    discipline (Winkler: any single blocking key has a perturbation blind
    spot; real deployments run several passes and union the candidates).

    Each pass is ONE equi-join on that pass's shared key columns,
    projected immediately to (left_id, right_id); passes union and dedup
    on the pair key BEFORE scoring, so a pair surviving several passes
    scores exactly once. Blocking recall is the union of per-pass recalls:
    a record whose name field is mangled still blocks via its phone pass
    and vice versa — only records mangled in EVERY pass key remain
    honest residual false negatives.

    Scale shape: per pass one key-partitioned equi-join (id-pair
    projection keeps the union narrow), one distinct on the pair key, two
    id-keyed rejoins to fetch scoring attributes. Nothing is all-pairs;
    no pass result is ever collected.
    """
    if not block_passes:
        raise ValueError("need at least one blocking pass")
    cands = None
    for keys in block_passes:
        p = (
            left.select(left_id, *keys)
            .join(right.select(right_id, *keys), list(keys))
            .select(left_id, right_id)
        )
        cands = p if cands is None else cands.unionAll(p)
    cands = cands.distinct()
    blk_cols = sorted({c for keys in block_passes for c in keys})
    pairs = cands.join(left.drop(*blk_cols), left_id).join(
        right.drop(*blk_cols), right_id
    )
    score = F.round(fs_score(features, weights), 6)
    return pairs.select(
        "*",
        score.alias("fs_score"),
        fs_classify(score, upper=upper, lower=lower).alias("fs_class"),
    )
