"""Column-level Avro decode/encode for Confluent-framed payloads.

Two paths, chosen by deployment:
- spark-avro jar present → ``from_avro(strip_frame(value), schema)`` /
  ``add_frame(to_avro(struct))`` — pure JVM (preferred at scale);
- no jar → Arrow-batched pandas UDFs around the pure-Python codec
  (:mod:`fluvii_spark.serde.avro_codec`). Batch-at-a-time, not per-row
  Python calls; still ~10× slower than the jar path, so the jar is the
  production deployment and this is the fallback/test path.
"""

from __future__ import annotations

import json
import sys
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from fluvii_spark.serde.avro_codec import AvroCodec
from fluvii_spark.serde.schema_loader import load_schema
from fluvii_spark.serde.wire import WIRE_HEADER_BYTES, add_frame, frame_header


def _json_default(v: Any) -> Any:
    """JSON bridge for the codec's non-JSON-native outputs.

    AvroCodec returns Decimal (decimal logical type), date / datetime
    (date / timestamp-millis / timestamp-micros), and bytes (bytes/fixed
    primitives) — json.dumps rejects all four without a handler. Decimals
    render as strings (exactness survives the trip; from_json casts them
    back), temporals as ISO-8601, bytes as latin-1 strings (the byte-
    preserving convention Avro's own JSON encoding uses).
    """
    import datetime as _dt
    from decimal import Decimal as _Dec

    if isinstance(v, _Dec):
        return str(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("latin-1")
    raise TypeError(f"not JSON-serializable: {type(v).__name__}")

try:  # ship this module's helpers by value (executors lack the package)
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


def spark_avro_available(spark) -> bool:
    """True when the spark-avro module is on the JVM classpath.

    Neither an attribute probe nor Class.forName answers this: py4j
    returns a ``JavaPackage`` placeholder (not an exception) for missing
    classes, the ``pyspark.sql.avro.functions`` wrapper always imports,
    and Spark 4 registers the SQL function stubs even without the
    spark-avro datasource jar — they throw AVRO_NOT_LOADED at ANALYSIS.
    So the truthful probe IS analysis: build a one-row to_avro projection
    (DataFrame analysis is eager — no job runs) and see whether the
    analyzer accepts it.
    """
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(to_avro(F.struct(F.lit(1).alias("x"))))
        return True
    except Exception:
        return False


def decode_framed_json(
    col: Column | str,
    schema: dict | str | list,
    schema_library_root: str | None = None,
) -> Column:
    """Framed Avro binary → JSON string column (python-codec path).

    JSON is the interchange so the caller can apply ``F.from_json`` with the
    matching Spark schema — keeping null semantics identical to the jar path.
    ``schema`` accepts every reference-supported spec form — dict,
    ``.avro``/``.avsc``/``.json`` file path, importable ``pkg.attr``, or
    inline JSON (:func:`fluvii_spark.serde.schema_loader.load_schema`).
    """
    codec = AvroCodec(load_schema(schema, schema_library_root))

    @F.pandas_udf("string")
    def _decode(s: pd.Series) -> pd.Series:
        def one(b: Any) -> str | None:
            if b is None:
                return None
            return json.dumps(
                codec.decode(bytes(b)[WIRE_HEADER_BYTES:]),
                default=_json_default,
            )

        return s.map(one)

    return _decode(F.col(col) if isinstance(col, str) else col)


def encode_framed(
    col: Column | str,
    schema: dict | str | list,
    schema_id: int,
    schema_library_root: str | None = None,
) -> Column:
    """Struct/map/string column (as JSON string) → framed Avro binary.

    ``schema`` accepts every reference-supported spec form (see
    :func:`decode_framed_json`)."""
    codec = AvroCodec(load_schema(schema, schema_library_root))
    header = frame_header(schema_id)

    @F.pandas_udf("binary")
    def _encode(s: pd.Series) -> pd.Series:
        def one(v: Any) -> bytes | None:
            if v is None:
                return None
            return header + codec.encode(json.loads(v) if isinstance(v, str) else v)

        return s.map(one)

    return _encode(F.col(col) if isinstance(col, str) else col)


def decode_framed_string_key(col: Column | str) -> Column:
    """Framed Avro *string* key → STRING (the reference hardcodes
    ``{"type": "string"}`` for every key — ``producer.py:62``).

    Arrow-batched UDF around the codec; with the spark-avro jar deployed use
    ``jvm_decode(col, '{"type": "string"}')`` instead.
    """
    codec = AvroCodec("string")

    @F.pandas_udf("string")
    def _decode(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: None
            if b is None
            else codec.decode(bytes(b)[WIRE_HEADER_BYTES:])
        )

    return _decode(F.col(col) if isinstance(col, str) else col)


def jvm_decode(col: Column | str, avro_schema_json: str) -> Column:
    """spark-avro path: strip frame then ``from_avro`` (requires the jar)."""
    from pyspark.sql.avro.functions import from_avro

    from fluvii_spark.serde.wire import strip_frame

    return from_avro(strip_frame(col), avro_schema_json)


def jvm_encode(col: Column | str, schema_id: int) -> Column:
    """spark-avro path: ``to_avro`` then prepend frame (requires the jar)."""
    from pyspark.sql.avro.functions import to_avro

    return add_frame(to_avro(F.col(col) if isinstance(col, str) else col), schema_id)
