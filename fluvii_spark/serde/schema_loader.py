"""Schema-spec resolution: dict | ``.avro``/``.avsc``/``.json`` path |
importable ``pkg.attr`` string | inline JSON string.

Mirrors the reference's producer-side schema loading
(``/root/reference/fluvii/components/producer/producer.py:95-134``): fluvii
apps pass schemas as python dicts, as paths to Avro JSON files, or as dotted
attribute paths into a "schema library" package (optionally rooted at a
filesystem path given by ``schema_library_root``). Resolution order is the
reference's:

1. non-string specs pass through unchanged;
2. a string ending in ``.avro`` / ``.avsc`` / ``.json`` is tried as a file
   path (absolute/CWD-relative, then relative to ``schema_library_root``)
   and parsed as Avro-schema JSON;
3. with ``schema_library_root`` set, the library package is imported from
   that filesystem path and the spec resolved as ``module.attr`` inside it
   (``producer.py:95-113``); without a root, plain dotted specs resolve
   against already-importable modules;
4. anything left is parsed as inline JSON (``producer.py:134``).

Unlike the reference (which swallows every failure with bare ``except`` and
falls through), failures here carry the attempted interpretations so a typo'd
path fails loudly instead of as a confusing JSON parse error.
"""

from __future__ import annotations

import importlib
import importlib.util
import json
import os
import sys
from typing import Any

_FILE_SUFFIXES = (".avro", ".avsc", ".json")

SchemaSpec = dict | list | str


def _load_schema_file(path: str) -> Any:
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def _import_library_root(schema_library_root: str) -> str:
    """Import the schema-library package from a filesystem path; returns the
    importable package name (reference ``producer.py:95-108``)."""
    root = schema_library_root.rstrip("/")
    name = os.path.basename(root)
    if name == "__init__.py":
        root = os.path.dirname(root)
        name = os.path.basename(root)
    init = os.path.join(root, "__init__.py")
    spec_file = init if os.path.exists(init) else root
    if name not in sys.modules:
        spec = importlib.util.spec_from_file_location(name, spec_file)
        if spec is None or spec.loader is None:
            raise ImportError(f"cannot import schema library at {root!r}")
        module = importlib.util.module_from_spec(spec)
        sys.modules[name] = module
        spec.loader.exec_module(module)
    return name


def _import_schema_attr(dotted: str) -> Any:
    """``pkg.mod.ATTR`` → the attribute value (reference
    ``producer.py:110-113``)."""
    parts = dotted.split(".")
    if len(parts) < 2:
        raise ImportError(f"not a dotted module attribute: {dotted!r}")
    module = importlib.import_module(".".join(parts[:-1]))
    return getattr(module, parts[-1])


def load_schema(
    spec: SchemaSpec, schema_library_root: str | None = None
) -> dict | list | str:
    """Resolve ``spec`` to an Avro schema structure (dict / union list /
    primitive name string) ready for :class:`~fluvii_spark.serde.avro_codec.
    AvroCodec` or registry registration."""
    if not isinstance(spec, str):
        return spec

    attempts: list[str] = []
    if spec.endswith(_FILE_SUFFIXES):
        for path in (
            spec,
            *(
                [os.path.join(schema_library_root, spec)]
                if schema_library_root
                else []
            ),
        ):
            try:
                return _load_schema_file(path)
            except (OSError, json.JSONDecodeError) as e:
                attempts.append(f"file {path!r}: {e}")

    looks_dotted = "." in spec and not spec.endswith(_FILE_SUFFIXES)
    if looks_dotted:
        try:
            if schema_library_root:
                _import_library_root(schema_library_root)
            return _import_schema_attr(spec)
        except (ImportError, AttributeError) as e:
            attempts.append(f"import {spec!r}: {e}")

    try:
        return json.loads(spec)
    except json.JSONDecodeError as e:
        attempts.append(f"inline JSON: {e}")

    raise ValueError(
        f"cannot resolve schema spec {spec!r}; tried: " + "; ".join(attempts)
    )
