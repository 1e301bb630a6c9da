"""The engine's query registry — the driver-contract surface.

Split by section from the original queries.py (round 5). Import order below
IS registration order; the driver's correctness window samples the first 50
registrations, so NEVER reorder these imports or registrations within a
module — append new queries to the last module (or a new one at the end).
"""

from __future__ import annotations

from crowdsorsa_etl_spark.queries._shared import ORACLES, QUERIES, register  # noqa: F401

# import order = registration order (load-bearing, see module docstring)
from crowdsorsa_etl_spark.queries.relational_core import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.llm_pack import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.relational_ext import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.parity_pipelines import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.curation_pack import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.round3_pack import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.kmeans_scale import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.round5_pack import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.round6_pack import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.round7_pack import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.round8_pack import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.round8c_pack import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.round8d_pack import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.round9_pack import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.round10_pack import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.round11_pack import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.round12_pack import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.round13_pack import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.round14_pack import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.round15_pack import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.round16_pack import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.round17_pack import *  # noqa: F401,F403
from crowdsorsa_etl_spark.queries.round18_pack import *  # noqa: F401,F403

from crowdsorsa_etl_spark.queries._shared import _ORDER_SNAPSHOT

# explicit raise, not assert: this guard is load-bearing (the driver's
# correctness window samples a registration-order prefix) and must survive
# python -O, which strips asserts
_names = list(QUERIES)
if _names[: len(_ORDER_SNAPSHOT)] != _ORDER_SNAPSHOT:
    raise ImportError(
        "query registration order drifted from the canonical snapshot; the "
        "driver correctness window depends on it"
    )
