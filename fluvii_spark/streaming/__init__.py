"""Streaming surface: keyed state tables, event-time windows, watermarks,
streaming dedup, and app lifecycle — the Spark-native re-expression of the
reference's stream-processing core (SURVEY.md §2.1 rows T1-T2, ST1-ST7, L1).
"""

from fluvii_spark.streaming.state import (  # noqa: F401
    TableTransaction,
    batch_keyed_fold,
    streaming_keyed_fold,
)
from fluvii_spark.streaming.app import MapApp, TableApp  # noqa: F401
