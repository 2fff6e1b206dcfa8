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
    if protocol is not None and not protocol.startswith("SASL_"):
        # an explicit non-SASL protocol with a SASL mechanism would compile
        # credentials the client silently ignores — the connection would
        # proceed unauthenticated; error at the config gate instead
        raise SecurityError(
            f"sasl_mechanism: {mechanism} requires a SASL_* security_protocol; "
            f"got security_protocol: {protocol} (the client would ignore the "
            "SASL credentials entirely)"
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


# ── Shared CLI security flags (security_args.rs twin) ─────────────────────
# The offset-reset family (`offset-reset execute|bulk`, `offset-rollback`)
# needs an ADMIN client on the target cluster; the reference shares one
# flag set + env-credential convention across those commands
# (security_args.rs:32-58) and compiles it to a SecurityConfig
# (security_args.rs:67-112).  The Spark twin compiles the same flags to the
# librdkafka/AdminClient conf keys instead of JAAS (that client speaks
# librdkafka spelling, not the JVM connector's kafka.* options).

_MECH_NORMALIZE = {
    "PLAIN": "PLAIN",
    "SCRAM-SHA256": "SCRAM-SHA-256",
    "SCRAM-SHA-256": "SCRAM-SHA-256",
    "SCRAM-SHA512": "SCRAM-SHA-512",
    "SCRAM-SHA-512": "SCRAM-SHA-512",
    "GSSAPI": "GSSAPI",
}


def security_from_cli(
    security_protocol: str | None = None,
    sasl_mechanism: str | None = None,
    sasl_keytab: str | None = None,
    sasl_krb5_config: str | None = None,
    sasl_kerberos_service_name: str | None = None,
    env: dict[str, str] | None = None,
) -> dict[str, Any]:
    """CLI flags + env → the ``security:`` config-dict shape.

    Reference parse semantics carried over (security_args.rs:116-149):
    unknown/absent protocol falls back to PLAINTEXT; a mechanism is only
    meaningful under SASL_* (else ignored); a SASL protocol with no
    mechanism defaults to PLAIN (pre-GSSAPI script compatibility);
    ``SCRAM-SHA256``/``SCRAM-SHA-256`` spellings both accepted.  Env
    conventions preserved: ``KAFKA_SASL_MECHANISM``, ``KAFKA_SASL_KEYTAB``,
    ``KAFKA_KRB5_CONFIG``, ``KAFKA_SASL_KERBEROS_SERVICE_NAME`` back the
    flags; ``KAFKA_USERNAME``/``KAFKA_PASSWORD`` supply SASL credentials;
    ``KAFKA_SSL_CA_CERT`` supplies the CA under SSL protocols.  Missing
    credentials do NOT error here (matching the reference, which constructs
    the config and lets the broker reject) — only the YAML→JAAS path is
    strict, because a JAAS string cannot be built without values.
    """
    e = os.environ if env is None else env
    proto = (security_protocol or "").upper()
    if proto not in ("SSL", "SASL_SSL", "SASL_PLAINTEXT"):
        proto = "PLAINTEXT"
    sec: dict[str, Any] = {"security_protocol": proto}
    if proto in ("SASL_PLAINTEXT", "SASL_SSL"):
        raw = (sasl_mechanism or e.get("KAFKA_SASL_MECHANISM") or "PLAIN").upper()
        mech = _MECH_NORMALIZE.get(raw)
        if mech is None:
            raise SecurityError(
                f"unsupported sasl_mechanism {raw!r} — expected one of: "
                "PLAIN, SCRAM-SHA256, SCRAM-SHA512, GSSAPI"
            )
        sec["sasl_mechanism"] = mech
        if mech == "GSSAPI":
            sec["sasl_kerberos_service_name"] = (
                sasl_kerberos_service_name
                or e.get("KAFKA_SASL_KERBEROS_SERVICE_NAME")
                or "kafka"
            )
            kt = sasl_keytab or e.get("KAFKA_SASL_KEYTAB")
            if kt:
                sec["sasl_keytab_path"] = kt
            krb5 = sasl_krb5_config or e.get("KAFKA_KRB5_CONFIG")
            if krb5:
                sec["sasl_krb5_config_path"] = krb5
        else:
            if e.get("KAFKA_USERNAME") is not None:
                sec["sasl_username"] = e["KAFKA_USERNAME"]
            if e.get("KAFKA_PASSWORD") is not None:
                sec["sasl_password"] = e["KAFKA_PASSWORD"]
    if proto in ("SSL", "SASL_SSL") and e.get("KAFKA_SSL_CA_CERT"):
        sec["ssl_ca_location"] = e["KAFKA_SSL_CA_CERT"]
    return sec


def rdkafka_options(security: dict[str, Any] | None) -> dict[str, str]:
    """security dict → librdkafka (confluent-kafka AdminClient) conf keys.

    Only present fields map; absent credentials stay absent so connect-time
    failure surfaces from the broker, exactly like the reference's
    constructed-but-unauthenticated client."""
    if not security:
        return {}
    out: dict[str, str] = {}
    mapping = {
        "security_protocol": "security.protocol",
        "sasl_mechanism": "sasl.mechanism",
        "sasl_username": "sasl.username",
        "sasl_password": "sasl.password",
        "ssl_ca_location": "ssl.ca.location",
        "sasl_kerberos_service_name": "sasl.kerberos.service.name",
        "sasl_keytab_path": "sasl.kerberos.keytab",
        "sasl_kerberos_principal": "sasl.kerberos.principal",
    }
    for src, dst in mapping.items():
        v = security.get(src)
        if v is not None:
            out[dst] = str(v)
    if out.get("security.protocol") == "PLAINTEXT":
        out.pop("security.protocol")  # librdkafka default; keep conf minimal
    return out


def _populate_tls(security: dict[str, Any], opts: dict[str, str]) -> None:
    """TLS locations (config.rs:210-220).  The JVM client takes PEM via
    ssl.truststore/keystore *.type=PEM (Kafka ≥2.7).  There is NO
    ``ssl.key.location`` in the JVM client (that's librdkafka spelling):
    a separate private key must be INLINED as ``ssl.keystore.key`` (KIP-651
    accepts the PEM text as the config value), with the cert chain inlined
    alongside it — so both files must be readable where the config is
    compiled.  The alternative the error message offers: concatenate key +
    cert into ONE PEM and pass it as ssl_certificate_location only."""
    ca = security.get("ssl_ca_location")
    cert = security.get("ssl_certificate_location")
    key = security.get("ssl_key_location")
    if ca is not None:
        opts["kafka.ssl.truststore.type"] = "PEM"
        opts["kafka.ssl.truststore.location"] = str(ca)
    if cert is not None and key is None:
        # combined key+cert PEM: a plain keystore location works as-is
        opts["kafka.ssl.keystore.type"] = "PEM"
        opts["kafka.ssl.keystore.location"] = str(cert)
    elif cert is not None or key is not None:
        if cert is None or key is None:
            raise SecurityError(
                "ssl_key_location without ssl_certificate_location: the key's "
                "cert chain is required. Provide both, or concatenate key+cert "
                "into one PEM and pass it as ssl_certificate_location."
            )
        try:
            key_pem = open(str(key)).read()
            cert_pem = open(str(cert)).read()
        except OSError as e:
            raise SecurityError(
                f"mTLS with a separate key file requires reading it at config "
                f"time ({e}). The JVM client has no ssl.key.location — the key "
                "must be inlined as ssl.keystore.key. Make both PEM files "
                "readable here, or concatenate key+cert into one PEM and pass "
                "it as ssl_certificate_location alone."
            ) from e
        opts["kafka.ssl.keystore.type"] = "PEM"
        opts["kafka.ssl.keystore.key"] = key_pem
        opts["kafka.ssl.keystore.certificate.chain"] = cert_pem
