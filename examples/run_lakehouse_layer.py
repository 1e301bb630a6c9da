#!/usr/bin/env python
"""The dependency-free lakehouse layer in one flow — the round-3 storage
operators wired together the way a table-format deployment uses them:

    orders → snapshot v1 (manifest-pointer write)
           → simulated next-day state → snapshot v2
           → CDC diff v1→v2 (what changed, for downstream delta shipping)
           → zone-map stats over a range-clustered copy
           → pruned quarter scan (reads only intersecting files)
           → time travel back to v1 (old version still readable)
           → vacuum to the newest 2 versions

Usage: python examples/run_lakehouse_layer.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crowdsorsa_etl_spark.operators.diff import diff_summary, table_diff
from crowdsorsa_etl_spark.operators.skipping import (
    collect_file_stats,
    prune_files,
    read_pruned,
)
from crowdsorsa_etl_spark.session import get_spark
from crowdsorsa_etl_spark.sinks.snapshots import (
    snapshot_read,
    snapshot_vacuum,
    snapshot_versions,
    snapshot_write,
)
from crowdsorsa_etl_spark.sources.parquet import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="lakehouse_demo_")
    )
    spark = get_spark(app_name="lakehouse_layer")
    orders = load_table(spark, "orders", sf_dir)

    # 1. versioned snapshots
    table = os.path.join(work, "orders_snap")
    v1 = snapshot_write(orders, table)
    nextday = orders.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderstatus") == "O", F.col("o_totalprice") * 1.02
        ).otherwise(F.col("o_totalprice")),
    ).filter(F.col("o_orderkey") % 251 != 0)
    v2 = snapshot_write(nextday, table)
    print(f"snapshots: versions={snapshot_versions(table)} (v{v1} -> v{v2})")

    # 2. CDC diff between the versions
    d = table_diff(
        snapshot_read(spark, table, version=v1),
        snapshot_read(spark, table, version=v2),
        ["o_orderkey"],
        ["o_totalprice"],
    )
    print("cdc summary:", {r.change_type: r.n for r in diff_summary(d).collect()})

    # 3. zone maps over a range-clustered copy + pruned scan
    clustered = os.path.join(work, "orders_by_date")
    orders.repartitionByRange(8, "o_orderdate").sortWithinPartitions(
        "o_orderdate"
    ).write.mode("overwrite").parquet(clustered)
    stats = collect_file_stats(spark, clustered, ["o_orderdate"])
    import datetime

    pred = {
        "o_orderdate": (
            datetime.datetime(1996, 1, 1),
            datetime.datetime(1996, 3, 31),
        )
    }
    n_files = stats.count()
    n_survive = prune_files(stats, pred).count()
    q1 = read_pruned(spark, stats, pred)
    print(
        f"zone maps: {n_survive}/{n_files} files scanned for the quarter, "
        f"{q1.count()} rows"
    )

    # 4. time travel + vacuum
    assert snapshot_read(spark, table, version=v1).count() == orders.count()
    removed = snapshot_vacuum(table, keep_last=2)
    print(f"time travel OK; vacuum removed versions {removed}")

    spark.stop()
    if len(sys.argv) <= 2:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
