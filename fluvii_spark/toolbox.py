"""Topic admin toolbox (SURVEY.md §2.1 A1-A5): list/create/alter/delete/sync.

Mirrors ``fluvii/kafka_tools/fluvii_toolbox.py`` behavior — skip-existing
creates, ignore-missing deletes, declarative sync (create missing, delete
extra, alter the rest) — over an injectable admin API. The real backend is
confluent-kafka's AdminClient when deployed (same client the reference
uses); tests inject a fake. Spark has no topic-admin surface, so this module
is deliberately Spark-free, exactly as the reference's toolbox is
framework-free.
"""

from __future__ import annotations

from typing import Protocol


class AdminApi(Protocol):
    """The minimal admin surface the toolbox needs."""

    def list_topics(self) -> dict[str, dict]: ...  # name -> {partitions, config}

    def create_topic(
        self, name: str, partitions: int, replication: int, config: dict
    ) -> None: ...

    def delete_topic(self, name: str) -> None: ...

    def alter_topic_config(self, name: str, config: dict) -> None: ...


def confluent_admin(bootstrap_servers: str, client_config: dict | None = None):
    """Real backend (requires confluent-kafka, not bundled in dev images)."""
    try:
        from confluent_kafka.admin import AdminClient, NewTopic  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "confluent-kafka is required for live topic administration; "
            "pip install confluent-kafka"
        ) from e

    class _Confluent:  # pragma: no cover - needs a broker
        def __init__(self) -> None:
            conf = {"bootstrap.servers": bootstrap_servers}
            conf.update(client_config or {})
            self._client = AdminClient(conf)

        def list_topics(self) -> dict[str, dict]:
            md = self._client.list_topics(timeout=10)
            return {
                name: {"partitions": len(t.partitions), "config": {}}
                for name, t in md.topics.items()
                if not name.startswith("__")
            }

        def create_topic(self, name, partitions, replication, config) -> None:
            fs = self._client.create_topics(
                [NewTopic(name, partitions, replication, config=config)]
            )
            fs[name].result()

        def delete_topic(self, name) -> None:
            self._client.delete_topics([name])[name].result()

        def alter_topic_config(self, name, config) -> None:
            from confluent_kafka.admin import ConfigResource

            res = ConfigResource(ConfigResource.Type.TOPIC, name, set_config=config)
            self._client.alter_configs([res])[res].result()

    return _Confluent()


class Toolbox:
    """A1-A5 with the reference's skip/ignore semantics."""

    def __init__(self, admin: AdminApi):
        self._admin = admin

    # A1 (fluvii_toolbox.py:60-70)
    def list_topics(self, valid_only: bool = True) -> dict[str, dict]:
        topics = self._admin.list_topics()
        if valid_only:
            topics = {
                n: m for n, m in topics.items() if not n.startswith("__")
            }
        return topics

    # A2 (fluvii_toolbox.py:72-94)
    def create_topics(
        self,
        topic_config_dict: dict[str, dict],
        ignore_existing_topics: bool = True,
    ) -> list[str]:
        existing = set(self._admin.list_topics())
        created = []
        for name, cfg in topic_config_dict.items():
            if name in existing:
                if ignore_existing_topics:
                    continue
                raise ValueError(f"topic exists: {name}")
            self._admin.create_topic(
                name,
                int(cfg.get("partitions", 1)),
                int(cfg.get("replication.factor", 1)),
                {
                    k: v
                    for k, v in cfg.items()
                    if k not in ("partitions", "replication.factor")
                },
            )
            created.append(name)
        return created

    # A4 (fluvii_toolbox.py:160-174)
    def delete_topics(
        self, topics: list[str], ignore_missing: bool = True
    ) -> list[str]:
        existing = set(self._admin.list_topics())
        deleted = []
        for name in topics:
            if name not in existing:
                if ignore_missing:
                    continue
                raise ValueError(f"topic missing: {name}")
            self._admin.delete_topic(name)
            deleted.append(name)
        return deleted

    # A3 (fluvii_toolbox.py:96-158)
    def alter_topics(
        self, topic_config_dict: dict[str, dict], retain_configs: bool = True
    ) -> list[str]:
        existing = self._admin.list_topics()
        altered = []
        for name, cfg in topic_config_dict.items():
            if name not in existing:
                continue
            new_cfg = {
                k: v
                for k, v in cfg.items()
                if k not in ("partitions", "replication.factor")
            }
            if retain_configs:
                merged = dict(existing[name].get("config", {}))
                merged.update(new_cfg)
                new_cfg = merged
            self._admin.alter_topic_config(name, new_cfg)
            altered.append(name)
        return altered

    # A5 (fluvii_toolbox.py:176-195)
    def sync_topics(self, topic_config_dict: dict[str, dict]) -> dict:
        existing = set(self.list_topics())
        desired = set(topic_config_dict)
        created = self.create_topics(
            {n: topic_config_dict[n] for n in desired - existing}
        )
        deleted = self.delete_topics(sorted(existing - desired))
        altered = self.alter_topics(
            {n: topic_config_dict[n] for n in desired & existing}
        )
        return {"created": created, "deleted": deleted, "altered": altered}
