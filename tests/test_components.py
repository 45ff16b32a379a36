"""Unit tests: serde (wire format, Avro codec, SR client), config
precedence (mirroring reference tests/unit/test_consumer_config.py),
toolbox declarative sync, murmur3 parity, metrics gauges."""

from __future__ import annotations

import json
import struct

import pytest

from fluvii_spark.config import AuthConfig, ConsumerConfig
from fluvii_spark.io.kafka import murmur3_32, offsets_json
from fluvii_spark.serde.avro_codec import AvroCodec
from fluvii_spark.serde.registry import SchemaRegistryClient
from fluvii_spark.serde.wire import frame_header, parse_frame
from fluvii_spark.toolbox import Toolbox

# ---------------------------------------------------------------------------
# wire format
# ---------------------------------------------------------------------------


def test_frame_roundtrip():
    body = b"\x02\x06foo"
    framed = frame_header(1234) + body
    sid, got = parse_frame(framed)
    assert sid == 1234
    assert got == body
    assert framed[0] == 0
    assert struct.unpack(">I", framed[1:5])[0] == 1234


def test_parse_frame_rejects_garbage():
    with pytest.raises(ValueError):
        parse_frame(b"\x01\x00\x00\x00\x01x")
    with pytest.raises(ValueError):
        parse_frame(b"\x00\x00")


# ---------------------------------------------------------------------------
# avro codec
# ---------------------------------------------------------------------------


def test_avro_string_known_bytes():
    # Avro binary string = zigzag length + utf8: "abc" -> 0x06 'a' 'b' 'c'
    assert AvroCodec("string").encode("abc") == b"\x06abc"
    assert AvroCodec("string").decode(b"\x06abc") == "abc"


def test_avro_zigzag_longs():
    c = AvroCodec("long")
    for v in (0, -1, 1, -2, 2, 63, -64, 64, 2**40, -(2**40)):
        assert c.decode(c.encode(v)) == v
    # spec examples: 0->0x00, -1->0x01, 1->0x02, 2->0x04
    assert c.encode(0) == b"\x00"
    assert c.encode(-1) == b"\x01"
    assert c.encode(1) == b"\x02"
    assert c.encode(2) == b"\x04"


def test_avro_record_roundtrip():
    schema = {
        "type": "record",
        "name": "Event",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"},
            {"name": "tags", "type": {"type": "map", "values": "string"}},
            {"name": "vals", "type": {"type": "array", "items": "int"}},
            {"name": "note", "type": ["null", "string"]},
        ],
    }
    c = AvroCodec(schema)
    rec = {
        "id": 7,
        "name": "héllo",
        "score": 1.5,
        "tags": {"a": "x", "b": "y"},
        "vals": [1, -2, 3],
        "note": None,
    }
    assert c.decode(c.encode(rec)) == rec
    rec["note"] = "set"
    assert c.decode(c.encode(rec)) == rec


def test_avro_record_missing_field_raises():
    schema = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "a", "type": "long"}],
    }
    with pytest.raises(ValueError, match="missing field"):
        AvroCodec(schema).encode({})


# ---------------------------------------------------------------------------
# schema registry client (fake transport)
# ---------------------------------------------------------------------------


def test_sr_client_register_and_fetch_cached():
    calls = []

    def transport(method, path, body=None):
        calls.append((method, path))
        if method == "POST":
            return {"id": 42}
        return {"schema": json.dumps({"type": "string"})}

    sr = SchemaRegistryClient("http://sr:8081", transport=transport)
    sid = sr.register("t-value", {"type": "string"})
    assert sid == 42
    assert sr.register("t-value", {"type": "string"}) == 42  # cached
    assert sr.get_schema(42) == {"type": "string"}
    sr.get_schema(42)  # cached
    assert calls == [
        ("POST", "/subjects/t-value/versions"),
        ("GET", "/schemas/ids/42"),
    ]


# ---------------------------------------------------------------------------
# config precedence (reference tests/unit/test_consumer_config.py:7-40)
# ---------------------------------------------------------------------------


def test_config_defaults():
    c = ConsumerConfig()
    assert c.bootstrap_servers == "localhost:9092"
    assert c.starting_offsets == "earliest"


def test_config_env_override(monkeypatch):
    monkeypatch.setenv("FLUVII_SPARK_CONSUMER_BOOTSTRAP_SERVERS", "k:9093")
    assert ConsumerConfig().bootstrap_servers == "k:9093"


def test_config_arg_beats_env(monkeypatch):
    monkeypatch.setenv("FLUVII_SPARK_CONSUMER_BOOTSTRAP_SERVERS", "k:9093")
    assert ConsumerConfig(bootstrap_servers="arg:1").bootstrap_servers == "arg:1"


def test_config_dotenv(monkeypatch, tmp_path):
    p = tmp_path / ".env"
    p.write_text("FLUVII_SPARK_CONSUMER_STARTING_OFFSETS=latest\n")
    monkeypatch.setenv("FLUVII_SPARK_CONFIG_DOTENV", str(p))
    assert ConsumerConfig().starting_offsets == "latest"
    # env beats dotenv
    monkeypatch.setenv("FLUVII_SPARK_CONSUMER_STARTING_OFFSETS", "earliest")
    assert ConsumerConfig().starting_offsets == "earliest"


def test_auth_plain_client_options():
    a = AuthConfig(mechanism="PLAIN", username="u", password="p")
    opts = a.as_spark_options()
    assert opts["kafka.sasl.mechanism"] == "PLAIN"
    assert 'username="u"' in opts["kafka.sasl.jaas.config"]
    assert AuthConfig(mechanism=None).as_spark_options() == {}


def test_auth_oauth_client_credentials_options():
    """Reference rule (auth/config.py:13,20-37): oauth_url set => OAUTHBEARER,
    client-credentials grant with (username, password) + scope. Spark-side
    that's KIP-768: token endpoint url + clientId/clientSecret/scope jaas."""
    a = AuthConfig(
        username="cid",
        password="csec",
        oauth_url="https://idp.example/token",
        oauth_scope="kafka",
    )
    assert a.resolved_mechanism() == "OAUTHBEARER"
    opts = a.as_spark_options()
    assert opts["kafka.sasl.mechanism"] == "OAUTHBEARER"
    assert (
        opts["kafka.sasl.oauthbearer.token.endpoint.url"]
        == "https://idp.example/token"
    )
    jaas = opts["kafka.sasl.jaas.config"]
    assert "OAuthBearerLoginModule" in jaas
    assert 'clientId="cid"' in jaas
    assert 'clientSecret="csec"' in jaas
    assert 'scope="kafka"' in jaas
    assert "LoginCallbackHandler" in opts["kafka.sasl.login.callback.handler.class"]

    # scope optional; no oauth_url + username => PLAIN (reference default)
    no_scope = AuthConfig(
        username="cid", password="csec", oauth_url="https://idp.example/token"
    ).as_spark_options()
    assert "scope=" not in no_scope["kafka.sasl.jaas.config"]
    assert AuthConfig(username="u", password="p").resolved_mechanism() == "PLAIN"


# ---------------------------------------------------------------------------
# offsets / partitioner parity
# ---------------------------------------------------------------------------


def test_offsets_json():
    s = offsets_json({"t": {0: 100, 2: "earliest", 3: "latest"}})
    assert json.loads(s) == {"t": {"0": 100, "2": -2, "3": -1}}
    with pytest.raises(ValueError):
        offsets_json({"t": "earliest"})


def test_murmur3_known_vectors():
    # published murmur3_x86_32 vectors (seed 0), signed like mmh3.hash
    assert murmur3_32(b"") == 0
    assert murmur3_32(b"hello") == 613153351
    assert murmur3_32(b"a") == 1009084850
    assert murmur3_32(b"abc") == -1277324294
    # partitioning is non-negative via python modulo even for negative hashes
    assert murmur3_32(b"abc") % 12 >= 0


# ---------------------------------------------------------------------------
# toolbox (A1-A5 semantics with a fake admin)
# ---------------------------------------------------------------------------


class FakeAdmin:
    def __init__(self, topics=None):
        self.topics = dict(topics or {})

    def list_topics(self):
        return dict(self.topics)

    def create_topic(self, name, partitions, replication, config):
        self.topics[name] = {"partitions": partitions, "config": dict(config)}

    def delete_topic(self, name):
        del self.topics[name]

    def alter_topic_config(self, name, config):
        self.topics[name]["config"] = dict(config)


def test_toolbox_create_skips_existing():
    admin = FakeAdmin({"a": {"partitions": 1, "config": {}}})
    tb = Toolbox(admin)
    created = tb.create_topics({"a": {"partitions": 3}, "b": {"partitions": 2}})
    assert created == ["b"]
    assert admin.topics["a"]["partitions"] == 1  # untouched
    with pytest.raises(ValueError):
        tb.create_topics({"a": {}}, ignore_existing_topics=False)


def test_toolbox_delete_ignores_missing():
    admin = FakeAdmin({"a": {"partitions": 1, "config": {}}})
    tb = Toolbox(admin)
    assert tb.delete_topics(["a", "zz"]) == ["a"]
    with pytest.raises(ValueError):
        tb.delete_topics(["zz"], ignore_missing=False)


def test_toolbox_alter_retains_configs():
    admin = FakeAdmin(
        {"a": {"partitions": 1, "config": {"retention.ms": "1", "x": "y"}}}
    )
    tb = Toolbox(admin)
    tb.alter_topics({"a": {"retention.ms": "9"}})
    assert admin.topics["a"]["config"] == {"retention.ms": "9", "x": "y"}


def test_toolbox_sync_declarative():
    admin = FakeAdmin(
        {
            "keep": {"partitions": 1, "config": {}},
            "extra": {"partitions": 1, "config": {}},
        }
    )
    tb = Toolbox(admin)
    result = tb.sync_topics(
        {"keep": {"cleanup.policy": "compact"}, "new": {"partitions": 2}}
    )
    assert result == {
        "created": ["new"],
        "deleted": ["extra"],
        "altered": ["keep"],
    }
    assert set(admin.topics) == {"keep", "new"}
    assert admin.topics["keep"]["config"]["cleanup.policy"] == "compact"


# ---------------------------------------------------------------------------
# lifecycle retries (L1 triage loop)
# ---------------------------------------------------------------------------


def test_run_with_retries_backoff_then_raise():
    from fluvii_spark.streaming.app import _AppBase

    class Boom(_AppBase):
        def __init__(self):
            super().__init__()
            self.starts = 0

        def start(self, **kw):
            self.starts += 1

            class Q:
                isActive = False

                def awaitTermination(self_inner):
                    raise RuntimeError("transient")

                def stop(self_inner):
                    pass

            return Q()

    sleeps = []
    app = Boom()
    try:
        app.run_with_retries(max_restarts=3, backoff_seconds=1.0, _sleep=sleeps.append)
        raise AssertionError("should raise after retries exhausted")
    except RuntimeError:
        pass
    assert app.starts == 4  # initial + 3 restarts
    assert sleeps == [1.0, 2.0, 4.0]  # exponential backoff


def test_register_temp_views(spark, sf_dir):
    from fluvii_spark.io.readers import register_temp_views

    register_temp_views(spark, sf_dir)
    n = spark.sql("SELECT count(*) c FROM lineitem").collect()[0]["c"]
    assert n > 0
    rev = spark.sql(
        "SELECT r_name, count(*) n FROM region GROUP BY r_name"
    ).count()
    assert rev == 5


def test_cli_produce_accepts_stdin(monkeypatch, tmp_path):
    """`topics produce --input -` pipes a JSON message array via stdin,
    like the reference CLI (fluvii/cli/commands/topics.py:100-111): the
    messages are staged to a JSON-Lines temp file and every flag reaches
    produce_from_json."""
    import json as _json

    from click.testing import CliRunner

    import fluvii_spark.cli as cli_mod

    seen = {}

    def fake_produce(spark_arg, bootstrap, path, **kw):
        seen["bootstrap"] = bootstrap
        seen["kwargs"] = kw
        with open(path) as f:
            seen["messages"] = [_json.loads(ln) for ln in f if ln.strip()]

    monkeypatch.setattr(
        "fluvii_spark.io.kafka.produce_from_json", fake_produce
    )
    monkeypatch.setattr(
        "fluvii_spark.session.get_session", lambda name: None
    )
    msgs = [
        {"key": "k1", "value": "v1", "topic": "t", "partition": 2,
         "headers": {"trace": "abc"}},
        {"key": "k2", "value": "v2", "topic": "t", "partition": 0},
    ]
    result = CliRunner().invoke(
        cli_mod.cli,
        [
            "topics", "--bootstrap-servers", "b:9092", "produce",
            "--input", "-", "--use-given-partitions",
        ],
        input=_json.dumps(msgs),
    )
    assert result.exit_code == 0, result.output
    assert seen["bootstrap"] == "b:9092"
    assert seen["kwargs"]["use_given_partitions"] is True
    assert seen["kwargs"]["binary_base64"] is False
    assert seen["messages"] == msgs


def test_require_spark_version_guard(spark):
    """q92/q118 lean on Spark-4 features (VARIANT, WITH RECURSIVE); the
    runtime guard must pass on the running 4.x session and produce a clear
    RuntimeError (not an opaque AttributeError) for an older cluster."""
    import pytest as _pytest

    from fluvii_spark.session import require_spark

    require_spark(spark, (4, 0), "test-feature")  # running session is 4.x
    with _pytest.raises(RuntimeError, match="requires Spark 99.0"):
        require_spark(spark, (99, 0), "test-feature")


def test_cli_plan_prints_shape_summary(spark, sf_dir):
    """`plan <query>` prints the formatted physical plan plus the audit
    summary line (exchange count, join strategies, pushdown, codegen) —
    the per-query form of tools/plan_audit.py."""
    from click.testing import CliRunner

    from fluvii_spark.cli import cli

    result = CliRunner().invoke(
        cli, ["plan", "q02_filter", "--sf-dir", sf_dir]
    )
    assert result.exit_code == 0, result.output
    assert "== Physical Plan ==" in result.output
    assert "-- shape:" in result.output
    assert "pushdown=yes" in result.output  # q02's filter reaches the scan

    bad = CliRunner().invoke(cli, ["plan", "nope"])
    assert bad.exit_code != 0
    assert "unknown query" in bad.output


def test_offsets_json_partition_counts_fill():
    """Spark's Kafka source requires specific startingOffsets to cover ALL
    partitions; partition_counts fills unlisted partitions with earliest."""
    import json as _json

    s = offsets_json({"t": {0: 100}}, partition_counts={"t": 4})
    d = _json.loads(s)
    assert d["t"] == {"0": 100, "1": -2, "2": -2, "3": -2}
    # explicit entries win over the fill
    s2 = offsets_json(
        {"t": {0: 100, 3: "latest"}}, partition_counts={"t": 4}
    )
    assert _json.loads(s2)["t"] == {"0": 100, "1": -2, "2": -2, "3": -1}


def test_streaming_dedup_partial_args_raise(spark):
    """Regression: ts_col without within (or vice versa) used to silently
    fall back to UNBOUNDED dropDuplicates — every-key-ever state growth on
    the streams the bounded form exists for. Now it raises."""
    import pytest as _pytest

    from fluvii_spark.streaming.windows import streaming_dedup

    df = spark.createDataFrame([(1, "a")], "id INT, ts STRING")
    with _pytest.raises(ValueError, match="BOTH ts_col and within"):
        streaming_dedup(df, ["id"], ts_col="ts")
    with _pytest.raises(ValueError, match="BOTH ts_col and within"):
        streaming_dedup(df, ["id"], within="10 minutes")
    # both-or-neither forms still work
    assert streaming_dedup(df, ["id"]).count() == 1


def test_resolve_master_defers_to_cluster_manager():
    """Regression: get_session pinned local[N] even under spark-submit,
    where builder.master() overrides --master and silently runs the whole
    cluster job in one local driver process."""
    from fluvii_spark.session import _resolve_master

    # plain local harness: default local master
    assert _resolve_master(None, "8", {}) == "local[8]"
    # spark-submit launched (gateway env): leave master to the manager
    assert _resolve_master(None, "8", {"PYSPARK_GATEWAY_PORT": "123"}) is None
    assert _resolve_master(None, "8", {"SPARK_MASTER": "yarn"}) is None
    # explicit caller wins everywhere
    assert (
        _resolve_master("local[2]", "8", {"SPARK_MASTER": "yarn"})
        == "local[2]"
    )


def test_apply_runtime_confs_respects_deliberate_overrides(spark):
    """Regression: AQE/Arrow prefs were force-reset on every query entry,
    clobbering an external driver's deliberate setting; only the REQUIRED
    correctness confs (nanos parquet, UTC) may be forced."""
    from fluvii_spark.session import apply_runtime_confs

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        apply_runtime_confs(spark)
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        # required confs ARE forced
        assert (
            spark.conf.get("spark.sql.session.timeZone") == "UTC"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_jaas_config_escaping_and_none_guard():
    """Regression: credentials were raw f-string-interpolated into JAAS —
    quotes/backslashes corrupted the config line, and missing credentials
    became the literal string 'None' sent to the broker."""
    import pytest as _pytest

    from fluvii_spark.config import AuthConfig

    opts = AuthConfig(
        mechanism="PLAIN", username='u"x', password="p\\w;"
    ).as_spark_options()
    jaas = opts["kafka.sasl.jaas.config"]
    assert 'username="u\\"x"' in jaas
    assert 'password="p\\\\w;"' in jaas
    with _pytest.raises(ValueError, match="username AND password"):
        AuthConfig(mechanism="PLAIN").as_spark_options()
    # KIP-768 handler must be the modern class (secured.* was removed)
    oauth = AuthConfig(
        oauth_url="https://idp/token", username="cid", password="sec"
    ).as_spark_options()
    assert (
        oauth["kafka.sasl.login.callback.handler.class"]
        == "org.apache.kafka.common.security.oauthbearer."
        "OAuthBearerLoginCallbackHandler"
    )


def test_tables_unknown_attr_is_attribute_error(spark, sf_dir):
    """Regression: Tables.__getattr__ leaked KeyError, breaking hasattr and
    getattr-with-default for typo'd table names."""
    from fluvii_spark.io.readers import load_tables

    t = load_tables(spark, sf_dir)
    assert not hasattr(t, "ordrs")
    assert getattr(t, "ordrs", None) is None


def test_run_with_retries_honors_signal_during_backoff():
    """Regression: a SIGTERM landing in the backoff sleep found no active
    query to stop, PEP-475 resumed the sleep, and the loop restarted the
    app — the shutdown request was silently lost."""
    from fluvii_spark.streaming.app import _AppBase

    class FakeQuery:
        def __init__(self, fail: bool):
            self._fail = fail
            self.isActive = False

        def awaitTermination(self):
            if self._fail:
                raise RuntimeError("boom")

        def stop(self):
            pass

    class FakeApp(_AppBase):
        def __init__(self):
            super().__init__()
            self.starts = 0

        def start(self, **kw):
            self.starts += 1
            self._query = FakeQuery(fail=True)
            return self._query

    app = FakeApp()

    def sleep_with_signal(_secs):
        # the "signal handler" fires mid-backoff
        app._stop_requested.set()
        app.stop()

    app.run_with_retries(max_restarts=5, _sleep=sleep_with_signal)
    assert app.starts == 1  # no restart after the stop request
