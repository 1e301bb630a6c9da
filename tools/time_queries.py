#!/usr/bin/env python
"""Quick per-query timing for optimization iteration: noop-sink wall,
N runs each (default 3), same measurement style as bench.py but for an
arbitrary query subset — NOT a replacement for bench.py's artifact.

Usage: python tools/time_queries.py [-n RUNS] <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crowdsorsa_etl_spark.queries import QUERIES
from crowdsorsa_etl_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    n_runs = 3
    if args and args[0] == "-n":
        n_runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="time_queries",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.range(1000).count()
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    import bench as _bench

    for name in args:
        fn = QUERIES[name]
        runs = []
        n = 0
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            obs = Observation()
            df.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
                "overwrite"
            ).format("noop").save()
            n = obs.get["n"]
            runs.append(round(time.perf_counter() - t0, 3))
            _bench._release_storage(spark)
        print(f"{name}: min={min(runs):.3f}s rows={n} runs={runs}")
    spark.stop()


if __name__ == "__main__":
    main()
