"""sasl_plugin + storage_path CLI twins (reference
commands/sasl_plugin.rs:1-122, commands/storage_path.rs:1-15): security
config compiles to kafka.* connector options with the reference's gate
semantics, and storage paths/URLs resolve to Hadoop URIs + conf."""

from __future__ import annotations

import os

import pytest

from kafka_backup_spark import config as cfgmod
from kafka_backup_spark.security import SecurityError, populate_sasl_options
from kafka_backup_spark.storage_path import (
    StoragePathError,
    resolve_storage_path,
    store_from_path,
)

# ── SASL wiring ───────────────────────────────────────────────────────────


def test_no_security_section_is_noop():
    # sasl_plugin.rs:75-87 (non-GSSAPI / no-mechanism no-op arms)
    assert populate_sasl_options(None) == {}
    assert populate_sasl_options({}) == {}


def test_plain_builds_jaas():
    opts = populate_sasl_options(
        {
            "security_protocol": "SASL_SSL",
            "sasl_mechanism": "PLAIN",
            "sasl_username": "svc",
            "sasl_password": 'p"w\\d',
        }
    )
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.sasl.mechanism"] == "PLAIN"
    # quotes/backslashes must be escaped inside the JAAS string
    assert '\\"' in opts["kafka.sasl.jaas.config"]
    assert "PlainLoginModule required" in opts["kafka.sasl.jaas.config"]


def test_scram_defaults_protocol_to_sasl_ssl():
    opts = populate_sasl_options(
        {"sasl_mechanism": "SCRAM-SHA-512", "sasl_username": "u", "sasl_password": "p"}
    )
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert "ScramLoginModule" in opts["kafka.sasl.jaas.config"]


def test_scram_without_credentials_is_actionable():
    with pytest.raises(SecurityError, match="sasl_username"):
        populate_sasl_options({"sasl_mechanism": "SCRAM-SHA-256"})


def test_gssapi_defaults_service_name_and_ticket_cache():
    # sasl_plugin.rs:41-45: service name defaults to "kafka"
    opts = populate_sasl_options({"sasl_mechanism": "GSSAPI"})
    assert opts["kafka.sasl.kerberos.service.name"] == "kafka"
    assert "useTicketCache=true" in opts["kafka.sasl.jaas.config"]


def test_gssapi_keytab_needs_principal(tmp_path):
    kt = tmp_path / "svc.keytab"
    kt.write_bytes(b"\x05\x02")
    with pytest.raises(SecurityError, match="sasl_kerberos_principal"):
        populate_sasl_options(
            {"sasl_mechanism": "GSSAPI", "sasl_keytab_path": str(kt)}
        )
    opts = populate_sasl_options(
        {
            "sasl_mechanism": "GSSAPI",
            "sasl_kerberos_service_name": "broker",
            "sasl_keytab_path": str(kt),
            "sasl_kerberos_principal": "svc@EXAMPLE.COM",
        }
    )
    assert opts["kafka.sasl.kerberos.service.name"] == "broker"
    assert "useKeyTab=true" in opts["kafka.sasl.jaas.config"]
    assert "svc@EXAMPLE.COM" in opts["kafka.sasl.jaas.config"]


def test_gssapi_missing_files_error_with_rebuild_style_hint(tmp_path):
    # the reference's actionable-error gate (sasl_plugin.rs:58-66): the
    # message must tell the operator what to DO, not just what broke
    with pytest.raises(SecurityError, match="krb5"):
        populate_sasl_options(
            {
                "sasl_mechanism": "GSSAPI",
                "sasl_krb5_config_path": str(tmp_path / "nope.conf"),
            }
        )
    with pytest.raises(SecurityError, match="keytab|kinit"):
        populate_sasl_options(
            {"sasl_mechanism": "GSSAPI", "sasl_keytab_path": str(tmp_path / "no.kt")}
        )


def test_bad_mechanism_and_protocol_rejected():
    with pytest.raises(SecurityError, match="sasl_mechanism"):
        populate_sasl_options({"sasl_mechanism": "OAUTHBEARER2"})
    with pytest.raises(SecurityError, match="security_protocol"):
        populate_sasl_options({"security_protocol": "SASSY"})


def test_config_validate_gates_security_section():
    # populate runs at config-load time (sasl_plugin.rs:23-28 call site)
    doc = {
        "mode": "backup",
        "backup_id": "b1",
        "source": {"security": {"sasl_mechanism": "PLAIN"}},
    }
    with pytest.raises(cfgmod.ConfigError, match="sasl_username"):
        cfgmod.load_config(doc)


def test_effective_config_exposes_kafka_options():
    doc = {
        "mode": "backup",
        "backup_id": "b1",
        "source": {
            "security": {
                "sasl_mechanism": "PLAIN",
                "sasl_username": "u",
                "sasl_password": "p",
            }
        },
    }
    eff = cfgmod.effective_config(cfgmod.load_config(doc))
    assert eff["kafka_options"]["kafka.sasl.mechanism"] == "PLAIN"


def test_tls_locations_map_to_pem_stores():
    opts = populate_sasl_options(
        {
            "ssl_ca_location": "/etc/ca.pem",
            "ssl_certificate_location": "/etc/cert.pem",
            "ssl_key_location": "/etc/key.pem",
        }
    )
    assert opts["kafka.ssl.truststore.type"] == "PEM"
    assert opts["kafka.ssl.truststore.location"] == "/etc/ca.pem"
    assert opts["kafka.ssl.keystore.location"] == "/etc/cert.pem"
    with pytest.raises(SecurityError, match="BOTH"):
        populate_sasl_options({"ssl_certificate_location": "/etc/cert.pem"})


# ── storage-path resolution ───────────────────────────────────────────────


def test_bare_path_is_filesystem(tmp_path):
    uri, conf = resolve_storage_path(str(tmp_path))
    assert uri == str(tmp_path) and conf == {}


def test_s3_url_grammar(monkeypatch):
    # config.rs:124-155: bucket/prefix/region/endpoint/path_style + env creds
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "AK")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "SK")
    uri, conf = resolve_storage_path(
        "s3://my-bucket/backups/prod?region=us-west-2&endpoint=http://minio:9000&path_style=true"
    )
    assert uri == "s3a://my-bucket/backups/prod"
    assert conf["fs.s3a.endpoint.region"] == "us-west-2"
    assert conf["fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["fs.s3a.path.style.access"] == "true"
    assert conf["fs.s3a.access.key"] == "AK"
    assert conf["fs.s3a.secret.key"] == "SK"


def test_s3_without_env_leaves_default_credential_chain(monkeypatch):
    monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
    _, conf = resolve_storage_path("s3://b")
    assert "fs.s3a.access.key" not in conf


def test_azure_and_gcs_urls(monkeypatch):
    monkeypatch.setenv("AZURE_STORAGE_KEY", "ZK")
    uri, conf = resolve_storage_path("azure://acct/container/pfx")
    assert uri == "abfss://container@acct.dfs.core.windows.net/pfx"
    assert conf["fs.azure.account.key.acct.dfs.core.windows.net"] == "ZK"
    monkeypatch.setenv("GOOGLE_APPLICATION_CREDENTIALS", "/tmp/sa.json")
    uri, conf = resolve_storage_path("gs://gbucket/p")
    assert uri == "gs://gbucket/p"
    assert conf["fs.gs.auth.service.account.json.keyfile"] == "/tmp/sa.json"


def test_file_memory_and_unknown_schemes():
    uri, _ = resolve_storage_path("file:///var/backups")
    assert uri == "/var/backups"
    mem1, _ = resolve_storage_path("memory://")
    mem2, _ = resolve_storage_path("memory://")
    assert os.path.isdir(mem1) and mem1 != mem2  # fresh store per resolve
    with pytest.raises(StoragePathError, match="Unknown storage scheme"):
        resolve_storage_path("ftp://host/x")
    with pytest.raises(StoragePathError, match="bucket"):
        resolve_storage_path("s3://")


def test_store_from_path_roundtrip(spark, sf_dir, tmp_path):
    # end-to-end through the segment sink: file:// URL round-trips records
    from kafka_backup_spark.schema import events_as_records, load_table

    recs = events_as_records(load_table(spark, sf_dir, "events")).limit(100)
    store = store_from_path(spark, f"file://{tmp_path}/seg")
    store.write(recs)
    assert store.read(spark).count() == 100
