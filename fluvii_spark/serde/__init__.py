"""Serialization layer: Confluent Schema-Registry wire format, Avro binary
codec, and the SR REST client (SURVEY.md §2.1 rows K1, C3; §7 hard part #2).

The reference serializes every key/value as Confluent-framed Avro
(``fluvii/components/producer/producer.py:62,136-140``,
``consumer/consumer.py:57-58``). Spark's ``from_avro`` cannot consume the
framed bytes (5-byte magic+id prefix), so framing lives here as explicit
column operations, with the Avro body handled either by spark-avro (when the
jar is deployed) or by the pure-Python codec via Arrow-batched UDFs.
"""

from fluvii_spark.serde.wire import (  # noqa: F401
    WIRE_HEADER_BYTES,
    frame_header,
    strip_frame,
    wire_schema_id,
)
from fluvii_spark.serde.avro_codec import AvroCodec  # noqa: F401
from fluvii_spark.serde.registry import SchemaRegistryClient  # noqa: F401
from fluvii_spark.serde.schema_loader import load_schema  # noqa: F401
