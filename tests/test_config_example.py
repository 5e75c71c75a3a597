"""The shipped config.yaml.example must decode cleanly through the full
validation surface (the reference ships config.yaml.example the same way)."""

from __future__ import annotations

import os

from scylla_migrator_spark.config import (
    Credentials,
    MigratorConfig,
    SSLOptions,
)

EXAMPLE = os.path.join(os.path.dirname(__file__), "..", "config.yaml.example")


def test_example_config_loads_and_redacts():
    cfg = MigratorConfig.load(EXAMPLE)
    assert cfg.source.type == "cql-fixture"
    assert cfg.source.preserve_timestamps is True
    assert cfg.source.split_count == 256
    assert isinstance(cfg.source.credentials, Credentials)
    assert isinstance(cfg.source.ssl_options, SSLOptions)
    assert cfg.target.exploded_timestamp_write is True
    assert [r.to_name for r in cfg.renames] == ["order_id"]
    assert cfg.primary_key == ["order_id"]
    assert cfg.validation.numeric_type_policy == "lenient"
    assert cfg.savepoints.interval_seconds == 300
    flat = str(cfg.rendered())
    assert "s3cret" not in flat and "tspass" not in flat
    assert "o_totalprice" not in flat  # where filter redacted
