#!/usr/bin/env python
"""2023 season in STREAMING mode — continuous ingest of arriving observation
files (the generalization of reference EP1, ``crowdsorsa-etl-2023.R``):

    arriving parquet files → file stream (1 file per micro-batch) →
    municipality recode + broadcast dim lookup (stream-static join) →
    mojibake repair + taxon decode → nested laji-etl documents →
    foreachBatch → rate-limited HTTP push (mock server here) per batch.

The batch pipeline is the degenerate one-file case of this path.

Usage: python examples/run_season_2023_streaming.py [work_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crowdsorsa_etl_spark.config import SinkConfig
from crowdsorsa_etl_spark.pipelines.crowdsorsa import documents_2023
from crowdsorsa_etl_spark.schemas import OBSERVATIONS_2023
from crowdsorsa_etl_spark.session import get_spark
from crowdsorsa_etl_spark.sources.observations import (
    municipality_dim,
    observations_2023,
)
from crowdsorsa_etl_spark.streaming.pipeline import start_http_push_stream


class _OkApi(BaseHTTPRequestHandler):
    def do_POST(self):  # noqa: N802
        self.rfile.read(int(self.headers.get("Content-Length", 0)))
        body = json.dumps({"status": "ok"}).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="season23_")
    inbox = os.path.join(work, "inbox")
    os.makedirs(inbox, exist_ok=True)
    spark = get_spark(app_name="season-2023-streaming")

    # 1. three "arriving" observation files (game exports landing over time)
    for i, (n, seed) in enumerate([(40, 7), (35, 8), (25, 9)]):
        observations_2023(spark, n=n, seed=seed).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(inbox, f"drop_{i}"))

    # 2. the continuous plan: file stream → documents (stream-static
    #    broadcast join against the 309-row municipality dim)
    obs_stream = (
        spark.readStream.schema(OBSERVATIONS_2023)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(inbox, "drop_*"))
    )
    docs_stream = documents_2023(obs_stream, municipality_dim(spark))

    # 3. push each micro-batch through the SAME rate-limited HTTP sink the
    #    batch pipeline uses
    server = HTTPServer(("127.0.0.1", 0), _OkApi)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    cfg = SinkConfig(
        api_url=f"http://127.0.0.1:{server.server_port}/",
        access_token="demo-token",
        docs_per_second_per_partition=200.0,
    )
    query = start_http_push_stream(
        docs_stream, cfg, checkpoint_dir=os.path.join(work, "checkpoint")
    )
    query.processAllAvailable()
    query.stop()
    n_batches = len(query.recentProgress)
    print(f"processed {n_batches} micro-batches; outputs in {work}")
    server.shutdown()
    spark.stop()


if __name__ == "__main__":
    main()
