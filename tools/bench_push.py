#!/usr/bin/env python
"""Measured HTTP-push throughput vs the reference baseline.

The reference's sink is a serial per-row loop with `Sys.sleep(.1)` — a hard
ceiling of 10 documents/second regardless of hardware
(crowdsorsa-etl-2023.R:220, BASELINE.md §(a)). The engine's sink keeps the
SAME 10 docs/s politeness limit PER PARTITION (sinks/http_push.py token
bucket) but pushes partitions concurrently, so throughput scales with
parallelism instead of being globally serial.

This benchmark pushes N documents through a local mock API at the
reference's own rate limit and reports measured docs/s. Usage:

    python tools/bench_push.py [n_docs] [n_partitions]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crowdsorsa_etl_spark.config import SinkConfig
from crowdsorsa_etl_spark.session import get_spark
from crowdsorsa_etl_spark.sinks.http_push import push_documents


class _Api(BaseHTTPRequestHandler):
    n_seen = 0
    lock = threading.Lock()

    def do_POST(self):  # noqa: N802
        self.rfile.read(int(self.headers["Content-Length"]))
        with _Api.lock:
            _Api.n_seen += 1
        body = b'{"status":"ok"}'
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):
        pass


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    server = ThreadingHTTPServer(("127.0.0.1", 0), _Api)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_port}/"

    spark = get_spark(app_name="bench_push")
    docs = spark.range(n_docs).selectExpr(
        "CAST(id AS STRING) AS obs_id",
        "to_json(named_struct('id', id, 'payload', repeat('x', 200)))"
        " AS document_json",
    )
    cfg = SinkConfig(
        api_url=url,
        access_token="bench-token",
        docs_per_second_per_partition=10.0,  # the REFERENCE's own rate limit
        max_retries=3,
    )
    t0 = time.perf_counter()
    audit = push_documents(docs, cfg, num_partitions=n_parts)
    n_ok = audit.filter("ok").count()
    wall = time.perf_counter() - t0
    server.shutdown()
    server.server_close()
    spark.stop()
    if _Api.n_seen < n_ok:  # the mock cross-checks the audit's claims
        raise AssertionError(f"API saw {_Api.n_seen} POSTs but audit says {n_ok} ok")

    rate = n_ok / wall
    print(
        json.dumps(
            {
                "metric": "push_docs_per_second",
                "n_docs": n_ok,
                "n_partitions": n_parts,
                "per_partition_limit": 10.0,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(rate, 1),
                "reference_docs_per_sec": 10.0,
                "speedup_vs_reference": round(rate / 10.0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
