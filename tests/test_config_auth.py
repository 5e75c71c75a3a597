"""Credentials / AWS assume-role chain / SSL / secure-connect bundle config
(reference config/Credentials.scala, AWSCredentials.scala, SSLOptions.scala,
CloudConfig.scala): decode-time validation + redaction in rendered()."""

from __future__ import annotations

import pytest

from scylla_migrator_spark.config import (
    AWSAssumeRole,
    AWSCredentials,
    CloudConfig,
    ConfigError,
    Credentials,
    MigratorConfig,
    SSLOptions,
)

ARN = "arn:aws:iam::123456789012:role/migrator"


def test_credentials_roundtrip_and_redaction():
    c = Credentials("cassandra", "hunter2")
    assert c.rendered() == {"username": "cassandra", "password": "<redacted>"}
    with pytest.raises(ConfigError, match="username"):
        Credentials("", "pw")
    with pytest.raises(ConfigError, match="password"):
        Credentials("u", "")


def test_aws_credentials_chain():
    a = AWSCredentials("AKIAX", "s3cr3t", {"arn": ARN})
    assert isinstance(a.assume_role, AWSAssumeRole)
    assert a.assume_role.get_session_name() == "scylla-migrator"
    b = AWSCredentials("AKIAX", "s3cr3t", {"arn": ARN, "sessionName": "mysess"})
    assert b.assume_role.get_session_name() == "mysess"
    r = a.rendered()
    assert r["accessKey"] == "<redacted>" and r["secretKey"] == "<redacted>"
    assert r["assumeRole"]["arn"] == ARN


def test_aws_invalid_chain_rejected():
    with pytest.raises(ConfigError, match="accessKey"):
        AWSCredentials("", "s")
    with pytest.raises(ConfigError, match="secretKey"):
        AWSCredentials("a", "")
    with pytest.raises(ConfigError, match="IAM role ARN"):
        AWSCredentials("a", "s", {"arn": "arn:aws:s3:::bucket"})
    with pytest.raises(ConfigError, match="IAM role ARN"):
        AWSCredentials("a", "s", {"arn": "role/migrator"})
    with pytest.raises(ConfigError, match="sessionName"):
        AWSCredentials("a", "s", {"arn": ARN, "sessionName": "bad name!"})


def test_ssl_options_defaults_and_validation():
    assert SSLOptions.DEFAULT_TRUST_STORE_TYPE == "JKS"
    assert SSLOptions.DEFAULT_PROTOCOL == "TLS"
    assert SSLOptions.DEFAULT_ENABLED_ALGORITHMS == (
        "TLS_RSA_WITH_AES_128_CBC_SHA",
        "TLS_RSA_WITH_AES_256_CBC_SHA",
    )
    s = SSLOptions(
        enabled=True,
        trust_store_path="/ts.jks",
        trust_store_password="tspw",
    )
    r = s.rendered()
    assert r["trust_store_password"] == "<redacted>"
    assert r["trust_store_path"] == "/ts.jks"  # paths are not secrets
    with pytest.raises(ConfigError, match="requires enabled"):
        SSLOptions(enabled=False, client_auth_enabled=True, key_store_path="/k")
    with pytest.raises(ConfigError, match="keyStorePath"):
        SSLOptions(enabled=True, client_auth_enabled=True)
    with pytest.raises(ConfigError, match="keyStorePassword"):
        SSLOptions(enabled=True, key_store_password="pw")
    with pytest.raises(ConfigError, match="trustStorePassword"):
        SSLOptions(enabled=True, trust_store_password="pw")


def test_cloud_config_path_forms():
    assert CloudConfig("/opt/bundle.zip").secure_bundle_path == "/opt/bundle.zip"
    assert CloudConfig("bundle.zip").secure_bundle_path == "bundle.zip"
    assert CloudConfig(" https://host/b.zip ").secure_bundle_path == "https://host/b.zip"
    CloudConfig("s3://bucket/b.zip")
    CloudConfig("s3a://bucket/b.zip")
    CloudConfig("file:///opt/b.zip")
    with pytest.raises(ConfigError, match="must not be empty"):
        CloudConfig("   ")
    with pytest.raises(ConfigError, match="plain HTTP"):
        CloudConfig("http://host/b.zip")
    with pytest.raises(ConfigError, match="user-info"):
        CloudConfig("https://user:pw@host/b.zip")
    with pytest.raises(ConfigError, match="query string"):
        CloudConfig("https://host/b.zip?token=x")
    with pytest.raises(ConfigError, match="absolute local path"):
        CloudConfig("ftp://host/b.zip")
    with pytest.raises(ConfigError, match="absolute local path"):
        CloudConfig("relative/dir/b.zip")


def _cfg(source_extra=None, target_extra=None):
    return MigratorConfig.from_dict(
        {
            "source": {"type": "parquet", "path": "/in", **(source_extra or {})},
            "target": {"type": "parquet", "path": "/out", **(target_extra or {})},
            "primaryKey": ["id"],
        }
    )


def test_full_config_decode_and_rendered_redaction():
    cfg = _cfg(
        source_extra={
            "host": "10.0.0.1:9042",
            "credentials": {"username": "u", "password": "pw"},
            "sslOptions": {
                "enabled": True,
                "trustStorePath": "/ts.jks",
                "trustStorePassword": "tspw",
            },
        },
        target_extra={
            "awsCredentials": {
                "accessKey": "AKIAX",
                "secretKey": "s3",
                "assumeRole": {"arn": ARN},
            }
        },
    )
    assert isinstance(cfg.source.credentials, Credentials)
    assert isinstance(cfg.source.ssl_options, SSLOptions)
    assert isinstance(cfg.target.aws_credentials, AWSCredentials)
    r = cfg.rendered()
    flat = str(r)
    assert "pw" == cfg.source.credentials.password  # intact in memory
    assert "hunter2" not in flat and "tspw" not in flat and "s3cr3t" not in flat
    assert r["source"]["credentials"]["password"] == "<redacted>"
    assert r["source"]["ssl_options"]["trust_store_password"] == "<redacted>"
    assert r["target"]["aws_credentials"]["secretKey"] == "<redacted>"
    assert r["target"]["aws_credentials"]["assumeRole"]["arn"] == ARN


def test_cloud_exclusivity_rules():
    with pytest.raises(ConfigError, match="mutually exclusive"):
        _cfg(
            source_extra={
                "host": "10.0.0.1",
                "cloud": {"secureBundlePath": "/b.zip"},
                "credentials": {"username": "u", "password": "p"},
            }
        )
    with pytest.raises(ConfigError, match="sslOptions are mutually exclusive"):
        _cfg(
            source_extra={
                "cloud": {"secureBundlePath": "/b.zip"},
                "sslOptions": {"enabled": True},
                "credentials": {"username": "u", "password": "p"},
            }
        )
    with pytest.raises(ConfigError, match="requires credentials"):
        _cfg(source_extra={"cloud": {"secureBundlePath": "/b.zip"}})
    # the legal combination decodes
    cfg = _cfg(
        source_extra={
            "cloud": {"secureBundlePath": "/b.zip"},
            "credentials": {"username": "u", "password": "p"},
        }
    )
    assert isinstance(cfg.source.cloud, CloudConfig)
    assert cfg.rendered()["source"]["cloud"] == {"secureBundlePath": "/b.zip"}


def test_consistency_level_parse():
    """ConsistencyLevelUtils parity: case-normalized parse-or-fail with the
    valid set listed in the error."""
    from scylla_migrator_spark.config import parse_consistency_level

    assert parse_consistency_level("local_quorum") == "LOCAL_QUORUM"
    assert parse_consistency_level(" ONE ") == "ONE"
    with pytest.raises(ConfigError, match="Valid values are: ANY, ONE"):
        parse_consistency_level("QUORUMM")
    cfg = _cfg(source_extra={"consistencyLevel": "local_one"})
    assert cfg.source.consistency_level == "LOCAL_ONE"
    with pytest.raises(ConfigError, match="Invalid consistency level"):
        _cfg(source_extra={"consistencyLevel": "nope"})


def test_compute_final_credentials_chain():
    """AwsUtils.computeFinalCredentials parity: static pass-through,
    assume-role exchange via an injected STS client, secrets never in
    repr."""
    from scylla_migrator_spark.functions.aws_creds import (
        ResolvedCredentials,
        compute_final_credentials,
    )

    assert compute_final_credentials(None) is None
    static = compute_final_credentials(AWSCredentials("AK", "SK"))
    assert static == ResolvedCredentials("AK", "SK", None)

    calls = []

    class FakeSts:
        def assume_role(self, role_arn, session_name, base):
            calls.append((role_arn, session_name, base.access_key))
            return {
                "AccessKeyId": "ASIA_TEMP",
                "SecretAccessKey": "TEMP_SK",
                "SessionToken": "TOKEN",
            }

    chained = compute_final_credentials(
        AWSCredentials("AK", "SK", {"arn": ARN}), FakeSts()
    )
    # base pair authenticated the STS call; session creds are the result
    assert calls == [(ARN, "scylla-migrator", "AK")]
    assert chained.session_token == "TOKEN" and chained.access_key == "ASIA_TEMP"
    assert "TEMP_SK" not in repr(chained) and "ASIA_TEMP" not in repr(chained)

    with pytest.raises(ValueError, match="no STS client"):
        compute_final_credentials(AWSCredentials("AK", "SK", {"arn": ARN}))
