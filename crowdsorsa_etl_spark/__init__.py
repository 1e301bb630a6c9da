"""crowdsorsa_etl_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the data-processing capabilities of
``luomus/crowdsorsa-etl`` (reference: two R ETL scripts, see
``/root/reference/crowdsorsa-etl-2023.R`` and ``crowdsorsa-etl-2024.R``)
as an idiomatic Spark DataFrame/SQL engine, extended with a general
relational operator surface and LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Design notes (100 TB design point):

* Everything is declared via the DataFrame/SQL API so Catalyst gets
  predicate pushdown, column pruning, join selection and whole-stage
  codegen for free; AQE handles skew and partition coalescing at runtime.
* Dimension lookups are broadcast joins; big joins shuffle on their keys.
* Python only runs in vectorized Arrow batches (pandas UDFs) and only
  where built-ins cannot express the semantics (geometry math, HTTP sink).
* No ``collect()`` in any data path — sinks are ``foreachPartition`` /
  ``foreachBatch``.
"""

__version__ = "0.1.0"

from crowdsorsa_etl_spark.session import get_spark  # noqa: F401
