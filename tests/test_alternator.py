"""Z10 Alternator settings model + fixture LB client, and K9 stream
enablement state machine (reference config/AlternatorSettings.scala,
DynamoUtils.scala:64-155, 337-401)."""

from __future__ import annotations

import pytest

from scylla_migrator_spark.config import (
    AlternatorSettings,
    ConfigError,
    SourceSettings,
    guard_plain_dynamodb_keys,
    validate_alternator_decoding,
)
from scylla_migrator_spark.sinks.dynamodb import (
    TableDescription,
    describe_stream_status,
    enable_dynamo_stream,
    replicate_table_definition,
    update_table_stream_spec,
)
from scylla_migrator_spark.sources.alternator import AlternatorFixtureClient, AlternatorNode


# ----------------------------------------------------------------- settings


def test_settings_job_conf_roundtrip():
    s = AlternatorSettings(
        datacenter="dc1",
        rack="r2",
        active_refresh_interval_ms=1000,
        compression=True,
        optimize_headers=False,
        max_connections=16,
        connection_timeout_ms=0,  # zero allowed (non-negative)
        max_items_per_batch=25,
    )
    conf = s.to_job_conf()
    assert conf["scylla.migrator.alternator.datacenter"] == "dc1"
    assert conf["scylla.migrator.alternator.compression"] == "true"
    assert conf["scylla.migrator.alternator.optimizeHeaders"] == "false"
    assert "scylla.migrator.alternator.idleRefreshIntervalMs" not in conf  # unset omitted
    assert AlternatorSettings.from_job_conf(conf) == s
    # empty settings round-trip to empty
    assert AlternatorSettings.from_job_conf(AlternatorSettings().to_job_conf()) == AlternatorSettings()


def test_settings_conf_parse_errors():
    with pytest.raises(ConfigError):
        AlternatorSettings.from_job_conf({"scylla.migrator.alternator.maxConnections": "lots"})
    with pytest.raises(ConfigError):
        AlternatorSettings.from_job_conf({"scylla.migrator.alternator.compression": "yep"})


def test_settings_validation_rules():
    with pytest.raises(ConfigError, match="rack"):
        AlternatorSettings(rack="r1")  # rack without datacenter
    with pytest.raises(ConfigError, match="maxConnections"):
        AlternatorSettings(max_connections=0)
    with pytest.raises(ConfigError, match="activeRefreshIntervalMs"):
        AlternatorSettings(active_refresh_interval_ms=-5)
    with pytest.raises(ConfigError, match="connectionTimeoutMs"):
        AlternatorSettings(connection_timeout_ms=-1)
    with pytest.raises(ConfigError, match="maxItemsPerBatch"):
        AlternatorSettings(max_items_per_batch=-2)
    # boundary: zero is fine for the non-negative family
    AlternatorSettings(connection_max_idle_time_ms=0)


def test_routing_scope_resolution():
    assert AlternatorSettings().routing_scope() == ("cluster", None, None)
    assert AlternatorSettings(datacenter="dc1").routing_scope() == ("datacenter", "dc1", None)
    assert AlternatorSettings(datacenter="dc1", rack="r1").routing_scope() == ("rack", "dc1", "r1")


def test_guard_rejects_alternator_keys_on_plain_dynamodb():
    guard_plain_dynamodb_keys({"type": "dynamodb", "table": "t"})  # clean: ok
    with pytest.raises(ConfigError, match="nested 'alternator' key"):
        guard_plain_dynamodb_keys({"type": "dynamodb", "alternator": {}})
    with pytest.raises(ConfigError, match="removeConsumedCapacity"):
        guard_plain_dynamodb_keys({"type": "dynamodb", "removeConsumedCapacity": True})
    with pytest.raises(ConfigError, match="Alternator-only fields: datacenter, rack"):
        guard_plain_dynamodb_keys({"type": "dynamodb", "rack": "r", "datacenter": "d"})


def test_endpoint_decode_validation():
    s = AlternatorSettings()
    with pytest.raises(ConfigError, match="endpoint"):
        validate_alternator_decoding(None, s)
    with pytest.raises(ConfigError, match="protocol prefix"):
        validate_alternator_decoding("alternator.example.com:8000", s)
    validate_alternator_decoding("http://alternator.example.com:8000", s)
    validate_alternator_decoding("HTTPS://alt:8043", s)


def test_source_settings_alternator_integration(tmp_path):
    src = SourceSettings(
        type="dynamodb-s3-export",
        path=str(tmp_path),
        endpoint="http://alt:8000",
        alternator={"datacenter": "dc1", "maxConnections": 8},
    )
    assert isinstance(src.alternator, AlternatorSettings)
    assert src.alternator.max_connections == 8
    with pytest.raises(ConfigError, match="endpoint"):
        SourceSettings(type="dynamodb-s3-export", path=str(tmp_path), alternator={})
    with pytest.raises(ConfigError, match="DynamoDB-family"):
        SourceSettings(type="parquet", path=str(tmp_path), alternator={})


# ---------------------------------------------------------------- LB client


_NODES = [
    AlternatorNode("n1", "dc1", "r1"),
    AlternatorNode("n2", "dc1", "r2"),
    AlternatorNode("n3", "dc2", "r1"),
]


def test_client_scope_filtering_and_round_robin():
    cluster = AlternatorFixtureClient(_NODES, AlternatorSettings())
    assert len(cluster.nodes) == 3
    dc = AlternatorFixtureClient(_NODES, AlternatorSettings(datacenter="dc1"))
    assert [n.host for n in dc.nodes] == ["n1", "n2"]
    # round-robin cycles deterministically over the scoped nodes
    assert [dc.next_node().host for _ in range(4)] == ["n1", "n2", "n1", "n2"]
    rack = AlternatorFixtureClient(_NODES, AlternatorSettings(datacenter="dc2", rack="r1"))
    assert [n.host for n in rack.nodes] == ["n3"]


def test_client_empty_scope_is_config_error():
    with pytest.raises(ConfigError, match="no alternator nodes"):
        AlternatorFixtureClient(_NODES, AlternatorSettings(datacenter="dc9"))


# ------------------------------------------------------- K9 stream enabling


def _catalog():
    cat: dict = {}
    replicate_table_definition(cat, TableDescription("t1", [("pk", "HASH")]))
    return cat


def test_enable_stream_polls_until_enabled():
    cat = _catalog()
    assert describe_stream_status(cat, "t1") == "DISABLED"
    waits = []
    arn = enable_dynamo_stream(cat, "t1", wait=waits.append)
    assert arn == "arn:fixture:dynamodb:t1/stream/1"
    assert describe_stream_status(cat, "t1") == "ENABLED"
    # two ENABLING polls before ENABLED -> one 5s wait between them
    assert waits == [5]


def test_enable_stream_idempotent_when_already_enabled():
    cat = _catalog()
    enable_dynamo_stream(cat, "t1")
    # second enable: no reset to ENABLING, same ARN, zero polls needed
    arn = enable_dynamo_stream(cat, "t1", max_retries=1)
    assert arn == "arn:fixture:dynamodb:t1/stream/1"


def test_enable_stream_view_type_conflict_and_missing_table():
    cat = _catalog()
    enable_dynamo_stream(cat, "t1", view_type="NEW_IMAGE")
    with pytest.raises(ValueError, match="view type"):
        update_table_stream_spec(cat, "t1", view_type="KEYS_ONLY")
    with pytest.raises(KeyError, match="ResourceNotFound"):
        enable_dynamo_stream(cat, "missing")
    with pytest.raises(ValueError, match="invalid stream view type"):
        update_table_stream_spec(cat, "t1", view_type="EVERYTHING")


def test_enable_stream_timeout():
    cat = _catalog()
    update_table_stream_spec(cat, "t1", polls_until_enabled=99)
    cat["t1"]["StreamSpecification"]["StreamEnabled"] = False  # force re-update w/ big countdown
    update_table_stream_spec(cat, "t1", polls_until_enabled=99)
    with pytest.raises(TimeoutError, match="Timed out"):
        enable_dynamo_stream(cat, "t1", max_retries=3)


@pytest.mark.slow
def test_snapshot_then_stream_enables_source_stream(spark, tmp_path):
    """K9 wired into T5: the source table's stream must be ENABLED before the
    snapshot copy begins."""
    from scylla_migrator_spark.streaming.cdc import CdcReplicator, snapshot_then_stream

    cat = _catalog()
    src = spark.createDataFrame(
        [(1, 100, "e1", "INSERT", "a")], "pk bigint, ts bigint, event_id string, op string, v string"
    )
    stage = tmp_path / "cdc_in"
    stage.mkdir()
    src.write.parquet(str(stage / "seed.parquet"))
    stream = spark.readStream.schema(src.schema).parquet(str(stage / "seed.parquet"))
    rep = CdcReplicator(str(tmp_path / "tgt"), ["pk"], ["v"])
    q = snapshot_then_stream(
        src, stream, rep, str(tmp_path / "ckpt"),
        source_catalog=cat, source_table="t1",
    )
    q.awaitTermination()
    assert describe_stream_status(cat, "t1") == "ENABLED"
    assert rep.current(spark).count() == 1


def test_discovery_refresh_node_added_and_removed():
    """Refresh state machine (DynamoUtils.scala:104-155): a node added to the
    /localnodes response enters the rotation at the next active-interval
    re-poll; a removed node drains. Time is injected — no sleeps."""
    from scylla_migrator_spark.sources.alternator import AlternatorFixtureClient

    topology = [
        AlternatorNode("n1", "dc1", "r1"),
        AlternatorNode("n2", "dc1", "r1"),
    ]
    client = AlternatorFixtureClient(
        None,
        AlternatorSettings(datacenter="dc1", active_refresh_interval_ms=1000,
                           idle_refresh_interval_ms=5000),
        discover=lambda: list(topology),
        now_ms=0,
    )
    assert [client.next_node(10).host, client.next_node(20).host] == ["n1", "n2"]

    # node added: visible only after the active interval elapses
    topology.append(AlternatorNode("n3", "dc1", "r2"))
    assert client.next_node(500).host == "n1"  # interval not elapsed yet
    hosts = [client.next_node(1100 + i).host for i in range(3)]
    assert "n3" in hosts and set(hosts) == {"n1", "n2", "n3"}

    # node removed: drains from the rotation at the next refresh
    removed = topology.pop(0)  # n1
    hosts = [client.next_node(2300 + i).host for i in range(4)]
    assert "n1" not in hosts
    assert removed in client.drained


def test_discovery_refresh_idle_vs_active_interval():
    """With no requests routed since the last refresh, the longer idle
    interval applies; routing a request switches to the active interval."""
    from scylla_migrator_spark.sources.alternator import AlternatorFixtureClient

    calls = {"n": 0}

    def discover():
        calls["n"] += 1
        return [AlternatorNode("n1", "dc1", "r1")]

    client = AlternatorFixtureClient(
        None,
        AlternatorSettings(datacenter="dc1", active_refresh_interval_ms=1000,
                           idle_refresh_interval_ms=60000),
        discover=discover,
        now_ms=0,
    )
    assert calls["n"] == 1
    # idle: 2s < idle interval, no re-poll
    assert client.maybe_refresh(2000) is False
    client.next_node()  # route one request -> active cadence
    assert client.maybe_refresh(2000) is True
    assert calls["n"] == 2


def test_discovery_refresh_keeps_last_known_good():
    """A failed or empty-scoped re-poll must not empty the rotation."""
    from scylla_migrator_spark.sources.alternator import AlternatorFixtureClient

    state = {"mode": "ok"}

    def discover():
        if state["mode"] == "raise":
            raise OSError("discovery endpoint down")
        if state["mode"] == "empty":
            return []
        return [AlternatorNode("n1", "dc1", "r1")]

    client = AlternatorFixtureClient(
        None,
        AlternatorSettings(datacenter="dc1", active_refresh_interval_ms=100,
                           idle_refresh_interval_ms=100),
        discover=discover,
        now_ms=0,
    )
    state["mode"] = "raise"
    assert client.maybe_refresh(200) is True
    assert client.next_node().host == "n1"
    state["mode"] = "empty"
    assert client.maybe_refresh(400) is True
    assert client.next_node().host == "n1"
    assert client.failed_refreshes == 2
