"""fluvii_spark — a PySpark-native analytics/stream-processing engine.

Re-implements, Spark-first, the capabilities of the reference Kafka-streams
framework (rh-marketingops/fluvii, surveyed in SURVEY.md): exactly-once
consume→transform→produce pipelines, keyed state tables, Avro/Schema-Registry
serde, topic admin tooling and metrics — plus the full relational operator
surface (joins/aggs/windows/set-ops/scalar functions) and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.

Layout:
  session      SparkSession factory with scale-tuned defaults
  io           batch readers/writers (parquet/json/csv + testdata loader)
  kafka        Confluent wire-format Avro serde, mmh3 partitioner, admin toolbox
  operators    relational / dedup / similarity / text / multimodal operators
  streaming    stateful table-app (applyInPandasWithState), windows, watermark
  queries      the declared query inventory (SURVEY.md §2.3) + duckdb oracles
"""

__version__ = "0.1.0"
