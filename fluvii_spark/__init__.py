"""fluvii_spark — a PySpark-native analytics/stream-processing engine.

Re-implements, Spark-first, the capabilities of the reference Kafka-streams
framework (rh-marketingops/fluvii, surveyed in SURVEY.md): exactly-once
consume→transform→produce pipelines, keyed state tables, Avro/Schema-Registry
serde, topic admin tooling and metrics — plus the full relational operator
surface (joins/aggs/windows/set-ops/scalar functions) and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.

Public API (lazy — submodules import only what they need):

    from fluvii_spark import get_session, load_tables
    from fluvii_spark.streaming import TableApp, MapApp, TableTransaction
    from fluvii_spark.queries import registry
"""

from fluvii_spark.session import apply_runtime_confs, get_session  # noqa: F401
from fluvii_spark.io.readers import load_table, load_tables  # noqa: F401

__version__ = "0.1.0"
