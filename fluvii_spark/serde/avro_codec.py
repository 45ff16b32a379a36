"""Minimal pure-Python Avro binary codec.

Covers the schema subset the reference actually exercises (SURVEY.md §1.2:
record of primitives, map<string,string>, arrays, unions-with-null — schemas
are plain dicts passed straight to confluent-kafka, e.g.
``fluvii/components/producer/producer.py:95-134``) plus the logical types
from the SURVEY type-mapping table (decimal / date / timestamp-millis /
timestamp-micros / uuid). Used on the Python side of Arrow-batched UDFs when
the spark-avro jar is not deployed, and for driver-side produce/dump
tooling. No external avro dependency.

Spec: Avro 1.11 binary encoding — zigzag-varint longs, length-prefixed
strings/bytes, block-encoded arrays/maps, union-index prefix; logical types
annotate the underlying primitive encoding.
"""

from __future__ import annotations

import datetime as dt
import decimal
import io
import struct
from typing import Any

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}

_EPOCH = dt.date(1970, 1, 1)
_EPOCH_DT = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


class AvroCodec:
    """Encode/decode Python values against one Avro schema (dict or str)."""

    def __init__(self, schema: dict | str | list):
        self.schema = schema

    # -- encode ---------------------------------------------------------------
    def encode(self, value: Any) -> bytes:
        buf = io.BytesIO()
        self._write(self.schema, value, buf)
        return buf.getvalue()

    def _write(self, schema: Any, value: Any, buf: io.BytesIO) -> None:
        if isinstance(schema, str):
            self._write_primitive(schema, value, buf)
        elif isinstance(schema, list):  # union: index then value
            idx = self._union_branch(schema, value)
            buf.write(_zigzag_encode(idx))
            self._write(schema[idx], value, buf)
        elif "logicalType" in schema and schema["type"] in _PRIMITIVES:
            self._write_logical(schema, value, buf)
        elif schema["type"] == "record":
            for field in schema["fields"]:
                try:
                    self._write(field["type"], value[field["name"]], buf)
                except KeyError as e:
                    raise ValueError(
                        f"record value missing field {field['name']!r}"
                    ) from e
        elif schema["type"] == "array":
            items = list(value)
            if items:
                buf.write(_zigzag_encode(len(items)))
                for item in items:
                    self._write(schema["items"], item, buf)
            buf.write(_zigzag_encode(0))
        elif schema["type"] == "map":
            entries = dict(value)
            if entries:
                buf.write(_zigzag_encode(len(entries)))
                for k, v in entries.items():
                    self._write_primitive("string", k, buf)
                    self._write(schema["values"], v, buf)
            buf.write(_zigzag_encode(0))
        elif schema["type"] == "enum":
            buf.write(_zigzag_encode(schema["symbols"].index(value)))
        elif schema["type"] in _PRIMITIVES:  # {"type": "string"} form
            self._write_primitive(schema["type"], value, buf)
        else:
            raise NotImplementedError(f"unsupported schema: {schema!r}")

    def _write_primitive(self, t: str, v: Any, buf: io.BytesIO) -> None:
        if t == "null":
            if v is not None:
                raise ValueError("null schema with non-null value")
        elif t == "boolean":
            buf.write(b"\x01" if v else b"\x00")
        elif t in ("int", "long"):
            buf.write(_zigzag_encode(int(v)))
        elif t == "float":
            buf.write(struct.pack("<f", float(v)))
        elif t == "double":
            buf.write(struct.pack("<d", float(v)))
        elif t == "bytes":
            b = bytes(v)
            buf.write(_zigzag_encode(len(b)))
            buf.write(b)
        elif t == "string":
            b = str(v).encode("utf-8")
            buf.write(_zigzag_encode(len(b)))
            buf.write(b)
        else:
            raise NotImplementedError(f"unsupported primitive: {t!r}")

    def _write_logical(self, schema: dict, value: Any, buf: io.BytesIO) -> None:
        lt, base = schema["logicalType"], schema["type"]
        if lt == "decimal" and base == "bytes":
            scale = int(schema.get("scale", 0))
            if not isinstance(value, decimal.Decimal):
                value = decimal.Decimal(str(value))
            unscaled = int(
                value.scaleb(scale).to_integral_value(rounding=decimal.ROUND_HALF_UP)
            )
            nbytes = max(1, (unscaled.bit_length() + 8) // 8)
            raw = unscaled.to_bytes(nbytes, "big", signed=True)
            self._write_primitive("bytes", raw, buf)
        elif lt == "date" and base == "int":
            days = (value - _EPOCH).days if isinstance(value, dt.date) else int(value)
            self._write_primitive("int", days, buf)
        elif lt in ("timestamp-millis", "timestamp-micros") and base == "long":
            if isinstance(value, dt.datetime):
                if value.tzinfo is None:
                    value = value.replace(tzinfo=dt.timezone.utc)
                delta = value - _EPOCH_DT
                micros = (delta.days * 86_400_000_000
                          + delta.seconds * 1_000_000 + delta.microseconds)
                value = micros // 1000 if lt == "timestamp-millis" else micros
            self._write_primitive("long", int(value), buf)
        elif lt == "uuid" and base == "string":
            self._write_primitive("string", str(value), buf)
        else:
            # unknown logical type: per Avro spec, fall back to the base type
            self._write_primitive(base, value, buf)

    def _read_logical(self, schema: dict, buf: io.BytesIO) -> Any:
        lt, base = schema["logicalType"], schema["type"]
        raw = self._read_primitive(base, buf)
        if lt == "decimal" and base == "bytes":
            scale = int(schema.get("scale", 0))
            unscaled = int.from_bytes(raw, "big", signed=True)
            return decimal.Decimal(unscaled).scaleb(-scale)
        if lt == "date" and base == "int":
            return _EPOCH + dt.timedelta(days=raw)
        if lt == "timestamp-millis" and base == "long":
            return _EPOCH_DT + dt.timedelta(milliseconds=raw)
        if lt == "timestamp-micros" and base == "long":
            return _EPOCH_DT + dt.timedelta(microseconds=raw)
        return raw

    def _union_branch(self, union: list, value: Any) -> int:
        for i, branch in enumerate(union):
            t = branch if isinstance(branch, str) else branch.get("type")
            if value is None and t == "null":
                return i
            if value is not None and t != "null":
                if t == "string" and isinstance(value, str):
                    return i
                if t in ("int", "long") and isinstance(value, int):
                    return i
                if t in ("float", "double") and isinstance(value, (int, float)):
                    return i
                if t == "boolean" and isinstance(value, bool):
                    return i
                if t in ("record", "map") and isinstance(value, dict):
                    return i
                if t == "array" and isinstance(value, (list, tuple)):
                    return i
                if t == "bytes" and isinstance(value, (bytes, bytearray)):
                    return i
        # fall back: first non-null branch for non-null values
        for i, branch in enumerate(union):
            t = branch if isinstance(branch, str) else branch.get("type")
            if (value is None) == (t == "null"):
                return i
        raise ValueError(f"no union branch for {value!r} in {union!r}")

    # -- decode ---------------------------------------------------------------
    def decode(self, payload: bytes) -> Any:
        buf = io.BytesIO(payload)
        value = self._read(self.schema, buf)
        return value

    def _read(self, schema: Any, buf: io.BytesIO) -> Any:
        if isinstance(schema, str):
            return self._read_primitive(schema, buf)
        if isinstance(schema, list):
            idx = _zigzag_decode(buf)
            return self._read(schema[idx], buf)
        if "logicalType" in schema and schema["type"] in _PRIMITIVES:
            return self._read_logical(schema, buf)
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: self._read(f["type"], buf) for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = _zigzag_decode(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix
                    n = -n
                    _zigzag_decode(buf)
                for _ in range(n):
                    out.append(self._read(schema["items"], buf))
        if t == "map":
            out: dict = {}
            while True:
                n = _zigzag_decode(buf)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _zigzag_decode(buf)
                for _ in range(n):
                    k = self._read_primitive("string", buf)
                    out[k] = self._read(schema["values"], buf)
        if t == "enum":
            return schema["symbols"][_zigzag_decode(buf)]
        if t in _PRIMITIVES:
            return self._read_primitive(t, buf)
        raise NotImplementedError(f"unsupported schema: {schema!r}")

    def _read_primitive(self, t: str, buf: io.BytesIO) -> Any:
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1) == b"\x01"
        if t in ("int", "long"):
            return _zigzag_decode(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return buf.read(_zigzag_decode(buf))
        if t == "string":
            return buf.read(_zigzag_decode(buf)).decode("utf-8")
        raise NotImplementedError(f"unsupported primitive: {t!r}")
