"""Confluent Schema Registry REST client (reference C3:
``fluvii/components/schema_registry/schema_registry.py:38-50`` — URL +
basic-auth client handed to confluent-kafka serializers).

Thin ``requests`` client over the SR REST API with an in-memory cache on
both directions (id→schema for consumers, subject+schema→id for producers).
``transport`` is injectable for tests (callable mimicking
``requests.Session.request``).
"""

from __future__ import annotations

import json
from typing import Any, Callable


class SchemaRegistryError(RuntimeError):
    pass


class SchemaRegistryClient:
    def __init__(
        self,
        url: str,
        username: str | None = None,
        password: str | None = None,
        transport: Callable | None = None,
    ):
        self.url = url.rstrip("/")
        self._auth = (username, password) if username else None
        if transport is None:  # pragma: no cover - network path
            import requests

            session = requests.Session()
            if self._auth:
                session.auth = self._auth

            def transport(method: str, path: str, body: dict | None = None):
                resp = session.request(
                    method,
                    f"{self.url}{path}",
                    json=body,
                    headers={
                        "Content-Type": "application/vnd.schemaregistry.v1+json"
                    },
                    timeout=30,
                )
                if resp.status_code >= 400:
                    raise SchemaRegistryError(
                        f"{method} {path} -> {resp.status_code}: {resp.text}"
                    )
                return resp.json()

        self._transport = transport
        self._by_id: dict[int, Any] = {}
        self._id_by_subject: dict[tuple[str, str], int] = {}

    def get_schema(self, schema_id: int) -> Any:
        """Schema dict for a wire-format id (consumer direction)."""
        if schema_id not in self._by_id:
            data = self._transport("GET", f"/schemas/ids/{schema_id}")
            self._by_id[schema_id] = json.loads(data["schema"])
        return self._by_id[schema_id]

    def register(self, subject: str, schema: dict | str | list) -> int:
        """Register (or look up) a schema under a subject -> wire id.

        The reference registers one value schema per topic (subject
        ``{topic}-value``) and the hardcoded string key schema
        (``producer.py:62``, ``fluvii/apps/fluvii_table_app.py:43``).
        """
        key = (subject, json.dumps(schema, sort_keys=True))
        if key not in self._id_by_subject:
            data = self._transport(
                "POST",
                f"/subjects/{subject}/versions",
                {"schema": json.dumps(schema)},
            )
            self._id_by_subject[key] = int(data["id"])
        return self._id_by_subject[key]

    def latest(self, subject: str) -> tuple[int, Any]:
        data = self._transport("GET", f"/subjects/{subject}/versions/latest")
        return int(data["id"]), json.loads(data["schema"])
