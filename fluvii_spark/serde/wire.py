"""Confluent Schema-Registry wire format: 1 magic byte (0x00) + 4-byte
big-endian schema id + Avro binary body.

The reference delegates this framing to confluent-kafka's serializers
(``fluvii/components/producer/producer.py:62``); Spark has no built-in for
it, so it is expressed as column operations here — JVM-side ``substring``/
``concat`` on BinaryType, no UDFs.
"""

from __future__ import annotations

import struct

from pyspark.sql import Column
from pyspark.sql import functions as F

WIRE_HEADER_BYTES = 5
_MAGIC = 0


def frame_header(schema_id: int) -> bytes:
    """The 5 header bytes for a schema id (magic 0x00 + BE int32)."""
    return struct.pack(">bI", _MAGIC, schema_id)


def parse_frame(payload: bytes) -> tuple[int, bytes]:
    """Driver-side split of a framed message -> (schema_id, avro_body)."""
    if len(payload) < WIRE_HEADER_BYTES or payload[0] != _MAGIC:
        raise ValueError("not a Confluent-framed payload")
    (schema_id,) = struct.unpack(">I", payload[1:5])
    return schema_id, payload[WIRE_HEADER_BYTES:]


def strip_frame(col: Column | str) -> Column:
    """Avro body column: drop the 5-byte header (JVM substring on binary)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(
        c, F.lit(WIRE_HEADER_BYTES + 1), F.length(c) - WIRE_HEADER_BYTES
    )


def wire_schema_id(col: Column | str) -> Column:
    """Schema-id column: bytes 2..5 as a big-endian int."""
    c = F.col(col) if isinstance(col, str) else col
    # conv(hex(bytes), 16, 10): endianness-safe, no UDF
    return F.conv(F.hex(F.substring(c, F.lit(2), F.lit(4))), 16, 10).cast("long")


def add_frame(col: Column | str, schema_id: int) -> Column:
    """Prepend the 5-byte header (a plan-time literal) to an Avro body."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit(frame_header(schema_id)), c)
