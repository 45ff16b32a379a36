"""Engine configuration (SURVEY.md §2.1 C1/C2).

Mirrors the reference's pattern — pydantic settings per component with
env-prefixed fields and precedence **kwarg > env > dotenv > default**
(``fluvii/config_bases.py:22-27``, ``README.md:210-222``) — without
requiring the pydantic-settings package: env resolution is explicit, ~30
lines, and unit-testable.

Env prefixes follow the reference's shape (``FLUVII_CONSUMER_*`` etc.,
e.g. ``fluvii/components/consumer/config.py:7-55``) with the engine name:
``FLUVII_SPARK_<COMPONENT>_<FIELD>``.
"""

from __future__ import annotations

import os
from typing import Any, ClassVar

from pydantic import BaseModel


def _load_dotenv(path: str) -> dict[str, str]:
    out: dict[str, str] = {}
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#") or "=" not in line:
                    continue
                k, _, v = line.partition("=")
                out[k.strip()] = v.strip().strip("'\"")
    except OSError:
        pass
    return out


class EnvConfigBase(BaseModel):
    """arg > env > dotenv > default, like the reference's ``KafkaConfigBase``."""

    env_prefix: ClassVar[str] = "FLUVII_SPARK_"

    def __init__(self, **kwargs: Any):
        dotenv_path = os.environ.get("FLUVII_SPARK_CONFIG_DOTENV")
        dotenv = _load_dotenv(dotenv_path) if dotenv_path else {}
        merged: dict[str, Any] = {}
        for name in self.__class__.model_fields:
            env_key = f"{self.env_prefix}{name.upper()}"
            if env_key in os.environ:
                merged[name] = os.environ[env_key]
            elif env_key in dotenv:
                merged[name] = dotenv[env_key]
        # explicit None kwargs are treated as ABSENT (fall through to
        # env/dotenv/default): with every Optional field defaulting to None
        # there is no way to distinguish "not passed" from None without a
        # sentinel, and "pass None to force-unset an env var" has no use in
        # this config surface. Documented here because the module docstring's
        # kwarg > env precedence applies to non-None kwargs only.
        merged.update({k: v for k, v in kwargs.items() if v is not None})
        super().__init__(**merged)


def _jaas_quote(v: str) -> str:
    """Escape a credential for a double-quoted JAAS value (backslash first,
    then quote) — generated secrets routinely contain both, and raw
    interpolation would truncate the config line or corrupt the password."""
    return v.replace("\\", "\\\\").replace('"', '\\"')


class SparkEngineConfig(EnvConfigBase):
    """Session-level knobs (the reference's throughput knobs are Kafka batch
    sizes — consumer/config.py:26-30; ours are Spark conf)."""

    env_prefix: ClassVar[str] = "FLUVII_SPARK_ENGINE_"

    app_name: str = "fluvii-spark"
    master: str | None = None
    shuffle_partitions: int | None = None
    driver_memory: str = "8g"
    adaptive_enabled: bool = True


class ConsumerConfig(EnvConfigBase):
    """Kafka source knobs (reference consumer/config.py)."""

    env_prefix: ClassVar[str] = "FLUVII_SPARK_CONSUMER_"

    bootstrap_servers: str = "localhost:9092"
    starting_offsets: str = "earliest"
    # reference batch_consume_max_count=100 (config.py:26) bounds one Kafka
    # transaction; maxOffsetsPerTrigger bounds one micro-batch
    max_offsets_per_trigger: int | None = None
    fail_on_data_loss: bool = False


class ProducerConfig(EnvConfigBase):
    """Kafka sink knobs (reference producer/config.py)."""

    env_prefix: ClassVar[str] = "FLUVII_SPARK_PRODUCER_"

    bootstrap_servers: str = "localhost:9092"
    topic: str | None = None
    idempotence: bool = True  # producer.py:55-67
    checkpoint_dir: str | None = None


class AuthConfig(EnvConfigBase):
    """SASL auth (reference fluvii/components/auth/config.py:8-50).

    The reference's rule (auth/config.py:13,20-23): ``oauth_url`` set ⇒
    OAUTHBEARER, else PLAIN; its ``oauth_cb`` fetches a client-credentials
    token with (username, password) basic auth + ``scope``
    (auth/config.py:25-37). Spark's Kafka clients run in the JVM, so the
    token fetch maps to Kafka's built-in OAuth login handler (KIP-768):
    token endpoint url + clientId/clientSecret/scope in the JAAS config —
    same grant, no Python callback."""

    env_prefix: ClassVar[str] = "FLUVII_SPARK_AUTH_"

    mechanism: str | None = None  # PLAIN | OAUTHBEARER (None → from oauth_url)
    username: str | None = None
    password: str | None = None
    oauth_url: str | None = None
    oauth_scope: str | None = None
    security_protocol: str = "SASL_SSL"

    def resolved_mechanism(self) -> str | None:
        if self.mechanism:
            return self.mechanism
        if self.oauth_url:
            return "OAUTHBEARER"
        return "PLAIN" if self.username else None

    def as_spark_options(self) -> dict[str, str]:
        """→ ``kafka.*`` options for Spark's Kafka source/sink (the
        reference's ``as_client_dict``, auth/config.py:39-50)."""
        mech = self.resolved_mechanism()
        if not mech:
            return {}
        opts = {
            "kafka.security.protocol": self.security_protocol,
            "kafka.sasl.mechanism": mech,
        }
        if mech == "PLAIN":
            if self.username is None or self.password is None:
                raise ValueError(
                    "SASL PLAIN needs username AND password (got "
                    f"username={'set' if self.username else None}) — "
                    "interpolating None would send the literal string "
                    "'None' to the broker"
                )
            opts["kafka.sasl.jaas.config"] = (
                "org.apache.kafka.common.security.plain.PlainLoginModule "
                f'required username="{_jaas_quote(self.username)}" '
                f'password="{_jaas_quote(self.password)}";'
            )
        elif mech == "OAUTHBEARER":
            # KIP-768 handler: the early-3.x "oauthbearer.secured" package
            # was removed; kafka-clients 3.2+ (what the Spark 4 connector
            # bundles) ships it under oauthbearer directly
            opts["kafka.sasl.login.callback.handler.class"] = (
                "org.apache.kafka.common.security.oauthbearer."
                "OAuthBearerLoginCallbackHandler"
            )
            if self.oauth_url:
                opts["kafka.sasl.oauthbearer.token.endpoint.url"] = self.oauth_url
                scope = f' scope="{self.oauth_scope}"' if self.oauth_scope else ""
                opts["kafka.sasl.jaas.config"] = (
                    "org.apache.kafka.common.security.oauthbearer."
                    "OAuthBearerLoginModule required "
                    f'clientId="{_jaas_quote(self.username)}" '
                    f'clientSecret="{_jaas_quote(self.password)}"{scope};'
                )
        return opts


class MetricsPusherConfig(EnvConfigBase):
    """Pushgateway loop settings (reference
    fluvii/components/metrics/pusher/config.py:5-13: hostname + a k8s
    headless service resolving to redundant pushgateways, 10 s default)."""

    env_prefix: ClassVar[str] = "FLUVII_SPARK_METRICS_PUSHER_"

    hostname: str = "fluvii-spark"
    service_name: str | None = None  # k8s headless service → gateway IPs
    service_port: int = 9091
    pod_app_port: int = 9091
    push_rate_seconds: float = 10.0


class SchemaRegistryConfig(EnvConfigBase):
    """reference fluvii/components/schema_registry/config.py."""

    env_prefix: ClassVar[str] = "FLUVII_SPARK_SR_"

    url: str = "http://localhost:8081"
    username: str | None = None
    password: str | None = None
