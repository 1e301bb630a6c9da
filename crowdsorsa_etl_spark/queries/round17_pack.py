"""Round 17: streaming-KLL batch contract (the carried-sketch fold with a
cell-exact merge-replay oracle), completing the streaming sketch triad
(HLL distinct / Misra-Gries heavy hitters / KLL quantiles).

Registration ORDER is load-bearing (the driver's correctness window
samples the first 50 registrations); this module is imported LAST by
queries/__init__.py, so its entries append after the round-16 tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crowdsorsa_etl_spark.queries._shared import _t, register

# ===========================================================================
# q117_kll_stream_fold — the streaming-KLL contract in batch form: the
# lineitem cents stream splits into 3 deterministic arrival batches
# (l_orderkey % 3, fold order 0,1,2); each batch builds its closed-form
# deterministic KLL cells DISTRIBUTED (one per-batch rank + one
# projection, operators/kll.py), and the sketch-sized cell lists fold
# driver-side through kll_merge — exactly what
# streaming/pipeline.start_kll_stream does per micro-batch epoch. The
# oracle replays every batch sketch from row_number() arithmetic AND the
# two merges from the same complete-block even-keep recurrence
# (kll_merge_sql), so the hash gate pins the exact carried-state cells a
# stream would hold after epoch 3 — not an estimate. NOTE: merged cells
# are deliberately NOT the one-shot sketch of the union (KLL merge
# preserves the rank-error bound, not the cell set — unlike HLL's
# idempotent max-merge); tests/test_round17.py pins stream == this fold,
# weight conservation, and the merge-degraded rank bound.
# ===========================================================================

_KLL_K = 32
_N_BATCHES = 3


def _fold_sql() -> str:
    from crowdsorsa_etl_spark.operators.kll import kll_fold_sql

    return kll_fold_sql(
        [
            (
                "SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,"
                f" l_orderkey, l_linenumber FROM lineitem"
                f" WHERE l_orderkey % {_N_BATCHES} = {i}",
                "cents",
                "cents, l_orderkey, l_linenumber",
            )
            for i in range(_N_BATCHES)
        ],
        k=_KLL_K,
    )


@register("q117_kll_stream_fold", _fold_sql())
def q117_kll_stream_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Carried-sketch cells after folding 3 arrival batches of lineitem
    price cents — the exact state a KLL stream holds after epoch 3."""
    from crowdsorsa_etl_spark.operators.kll import kll_cells_sorted, kll_merge

    li = _t(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    acc: list | None = None
    for i in range(_N_BATCHES):
        batch = li.filter(F.col("l_orderkey") % _N_BATCHES == i)
        cells = [
            (r["level"], r["pos"], r["value"], r["weight"])
            for r in kll_cells_sorted(
                batch, "cents", ["l_orderkey", "l_linenumber"], k=_KLL_K
            ).collect()
        ]
        acc = cells if acc is None else kll_merge(acc, cells, _KLL_K)
    return spark.createDataFrame(
        acc, "level int, pos bigint, value bigint, weight bigint"
    )
