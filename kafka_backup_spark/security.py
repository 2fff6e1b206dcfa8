"""Security config → Spark Kafka source options (X3 twin of the reference's
CLI SASL wiring).

Reference: crates/kafka-backup-cli/src/commands/sasl_plugin.rs:1-122 (the
``populate_sasl_plugin`` entry point that inspects ``security.sasl_mechanism``
after YAML parse and installs mechanism-specific machinery) and
crates/kafka-backup-core/src/config.rs:193-260 (the ``SecurityConfig``
document shape: protocol, mechanism, username/password, TLS locations,
Kerberos service-name/keytab/krb5.conf).

The Spark-first translation: there is no handshake plugin to construct —
Spark's Kafka connector already implements PLAIN, SCRAM-SHA-256/512 and
GSSAPI in the JVM client.  The CLI step therefore compiles the SAME config
document into the connector's ``kafka.*`` option map (JAAS string included),
which rides ``spark.read.format("kafka").options(...)`` via
``kafka_io.source_options(extra=...)``.  What survives from the reference's
shape is the gate semantics: mechanisms that need extra runtime state
(GSSAPI's krb5.conf) surface an actionable error at config time, not a
JVM stack trace at connect time.
"""

from __future__ import annotations

import os
from typing import Any

VALID_PROTOCOLS = ("PLAINTEXT", "SSL", "SASL_PLAINTEXT", "SASL_SSL")
# YAML spelling (config.rs:321-331 serde enum) → Kafka client mechanism name
MECHANISMS = {
    "PLAIN": "PLAIN",
    "SCRAM-SHA-256": "SCRAM-SHA-256",
    "SCRAM-SHA-512": "SCRAM-SHA-512",
    "GSSAPI": "GSSAPI",
}

_PLAIN_JAAS = "org.apache.kafka.common.security.plain.PlainLoginModule"
_SCRAM_JAAS = "org.apache.kafka.common.security.scram.ScramLoginModule"
_KRB5_JAAS = "com.sun.security.auth.module.Krb5LoginModule"


class SecurityError(ValueError):
    pass


def _jaas_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def populate_sasl_options(security: dict[str, Any] | None) -> dict[str, str]:
    """Compile a ``security:`` config section into ``kafka.*`` source options.

    Twin of ``populate_sasl_plugin`` (sasl_plugin.rs:23-28): called right
    after config parse; a missing/None section or a mechanism-less protocol
    is a no-op (empty dict), mirroring the reference's non-GSSAPI no-op
    arms.  Returns options ready for ``source_options(extra=...)``.
    """
    if not security:
        return {}
    opts: dict[str, str] = {}
    protocol = security.get("security_protocol")
    mechanism = security.get("sasl_mechanism")
    if protocol is not None:
        if protocol not in VALID_PROTOCOLS:
            raise SecurityError(
                f"security_protocol must be one of {VALID_PROTOCOLS}, got {protocol!r}"
            )
        opts["kafka.security.protocol"] = protocol
    if mechanism is None:
        _populate_tls(security, opts)
        return opts
    if mechanism not in MECHANISMS:
        raise SecurityError(
            f"sasl_mechanism must be one of {tuple(MECHANISMS)}, got {mechanism!r}"
        )
    opts["kafka.sasl.mechanism"] = MECHANISMS[mechanism]
    opts.setdefault(
        "kafka.security.protocol",
        protocol or ("SASL_SSL" if mechanism != "PLAIN" else "SASL_PLAINTEXT"),
    )

    if mechanism == "GSSAPI":
        _populate_gssapi(security, opts)
    else:
        user = security.get("sasl_username")
        pw = security.get("sasl_password")
        if user is None or pw is None:
            raise SecurityError(
                f"sasl_mechanism: {mechanism} requires sasl_username and sasl_password"
            )
        module = _PLAIN_JAAS if mechanism == "PLAIN" else _SCRAM_JAAS
        opts["kafka.sasl.jaas.config"] = (
            f'{module} required username="{_jaas_escape(user)}" '
            f'password="{_jaas_escape(pw)}";'
        )
    _populate_tls(security, opts)
    return opts


def _populate_gssapi(security: dict[str, Any], opts: dict[str, str]) -> None:
    """GSSAPI arm (sasl_plugin.rs:38-66).  The reference errors when the
    binary lacks the gssapi feature; the Spark twin's runtime requirement is
    a resolvable krb5 configuration — enforce it here with the same kind of
    actionable message instead of letting the JVM fail mid-connect."""
    service = security.get("sasl_kerberos_service_name") or "kafka"
    opts["kafka.sasl.kerberos.service.name"] = service
    keytab = security.get("sasl_keytab_path")
    krb5_conf = security.get("sasl_krb5_config_path")
    if krb5_conf is not None and not os.path.exists(str(krb5_conf)):
        raise SecurityError(
            f"sasl_krb5_config_path {krb5_conf!r} does not exist. GSSAPI needs a "
            "readable krb5.conf; pass it via sasl_krb5_config_path and launch Spark "
            "with --conf spark.driver.extraJavaOptions=-Djava.security.krb5.conf=... "
            "(and the matching executor conf) so the JVM resolves the realm."
        )
    if keytab is not None:
        if not os.path.exists(str(keytab)):
            raise SecurityError(
                f"sasl_keytab_path {keytab!r} does not exist. Provide the keytab on "
                "every node (e.g. --files) or unset it to use the kinit credential "
                "cache."
            )
        principal = security.get("sasl_kerberos_principal")
        if not principal:
            raise SecurityError(
                "sasl_keytab_path is set but sasl_kerberos_principal is not; the "
                "JAAS Krb5LoginModule needs the principal that owns the keytab "
                "(e.g. backup-svc@EXAMPLE.COM)."
            )
        opts["kafka.sasl.jaas.config"] = (
            f'{_KRB5_JAAS} required useKeyTab=true storeKey=true '
            f'keyTab="{_jaas_escape(str(keytab))}" '
            f'principal="{_jaas_escape(str(principal))}";'
        )
    else:
        # OS credential cache (kinit), the reference's keytab-less default
        opts["kafka.sasl.jaas.config"] = f"{_KRB5_JAAS} required useTicketCache=true;"


def _populate_tls(security: dict[str, Any], opts: dict[str, str]) -> None:
    """TLS locations (config.rs:210-220).  The JVM client takes PEM via
    ssl.truststore/keystore *.type=PEM on Kafka ≥2.7, the broker-side names
    Spark passes straight through."""
    ca = security.get("ssl_ca_location")
    cert = security.get("ssl_certificate_location")
    key = security.get("ssl_key_location")
    if ca is not None:
        opts["kafka.ssl.truststore.type"] = "PEM"
        opts["kafka.ssl.truststore.location"] = str(ca)
    if cert is not None or key is not None:
        if cert is None or key is None:
            raise SecurityError(
                "mTLS needs BOTH ssl_certificate_location and ssl_key_location"
            )
        opts["kafka.ssl.keystore.type"] = "PEM"
        opts["kafka.ssl.keystore.location"] = str(cert)
        opts["kafka.ssl.key.location"] = str(key)
