"""Astra / DataStax Cloud secure-connect bundle handling (S7).

The reference connects to cloud deployments through a secure-connect bundle
zip (CloudSniEndToEndIT.java:92-168): ``cloud.secureConnectBundle`` points
at a local file or an HTTP(S) URL; the bundle carries the SNI proxy
endpoint plus the TLS material, and weak consistency levels are forced to
LOCAL_QUORUM (CloudSniEndToEndIT.java:91-104 pins the exact log line).

The bundle layout is the public format produced by Astra and consumed by
the DataStax drivers::

    secure-connect-<db>.zip
    ├── config.json      host/port + member locations (+ legacy creds)
    ├── ca.crt           CA certificate (PEM)
    ├── cert             client certificate (PEM)
    ├── key              client private key (PEM)
    ├── identity.jks     client keystore (JKS, for Java drivers)
    ├── trustStore.jks   CA truststore (JKS, for Java drivers)
    └── cqlshrc          cqlsh config

This module parses and validates that layout and resolves the connection
plan (endpoint, TLS members, inferred credentials); the live SNI/TLS wire
path belongs to the driver and is exercised only against a real cluster.
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from dataclasses import dataclass, field

from kafka_sink_spark.config import ConfigError, SinkConfig

#: config.json members whose referenced files must exist in the archive.
_LOCATION_KEYS = (
    "caCertLocation",
    "certLocation",
    "keyLocation",
    "trustStoreLocation",
    "keyStoreLocation",
)


@dataclass
class SecureBundle:
    """Validated contents of a secure-connect bundle."""

    host: str
    port: int  # metadata-service port (config.json "port")
    cql_port: int  # SNI CQL port (config.json "cql_port")
    local_dc: str | None = None
    keyspace: str | None = None
    # Legacy bundles embed database credentials in config.json; newer
    # bundles omit them and the connector's auth.* settings apply.
    username: str | None = None
    password: str | None = None
    trust_store_password: str | None = None
    key_store_password: str | None = None
    ca_cert_pem: bytes | None = None
    client_cert_pem: bytes | None = None
    client_key_pem: bytes | None = None
    members: list[str] = field(default_factory=list)

    @property
    def metadata_service_url(self) -> str:
        """The HTTPS metadata endpoint the SNI routing handshake contacts
        first (public Astra topology discovery)."""
        return f"https://{self.host}:{self.port}/metadata"


def fetch_secure_bundle(location: str, opener=None) -> bytes:
    """Fetch the bundle bytes from a local path or an HTTP(S) URL
    (CloudSniEndToEndIT.java:152-168: the reference accepts the bundle
    from a web server).  ``opener`` injects the URL transport for tests;
    the default is ``urllib.request.urlopen``."""
    if location.startswith(("http://", "https://")):
        if opener is None:
            from urllib.request import urlopen as opener  # type: ignore
        with opener(location) as resp:  # nosec - config-provided URL
            return resp.read()
    with open(location, "rb") as f:
        return f.read()


def parse_secure_bundle(location: str | bytes, opener=None) -> SecureBundle:
    """Parse + validate a secure-connect bundle zip.

    Raises ConfigError on a missing/corrupt archive, missing config.json,
    missing required endpoint fields, or a config.json member reference
    (truststore/keystore/cert) that is absent from the archive.
    """
    if isinstance(location, bytes):
        raw = location
    else:
        try:
            raw = fetch_secure_bundle(location, opener=opener)
        except OSError as exc:
            raise ConfigError(f"cannot read secure-connect bundle: {exc}") from exc
    try:
        zf = zipfile.ZipFile(io.BytesIO(raw))
    except zipfile.BadZipFile as exc:
        raise ConfigError(
            "secure-connect bundle is not a valid zip archive"
        ) from exc
    members = zf.namelist()
    if "config.json" not in members:
        raise ConfigError("secure-connect bundle has no config.json")
    try:
        conf = json.loads(zf.read("config.json"))
    except json.JSONDecodeError as exc:
        raise ConfigError(
            "secure-connect bundle config.json is not valid JSON"
        ) from exc
    host = conf.get("host")
    port = conf.get("port")
    if not host or not port:
        raise ConfigError(
            "secure-connect bundle config.json must define host and port"
        )
    for key in _LOCATION_KEYS:
        loc = conf.get(key)
        if loc:
            member = os.path.basename(loc.replace("\\", "/"))
            if member not in members:
                raise ConfigError(
                    f"secure-connect bundle config.json references missing "
                    f"member {member!r} ({key})"
                )

    def _member(name: str) -> bytes | None:
        return zf.read(name) if name in members else None

    return SecureBundle(
        host=host,
        port=int(port),
        cql_port=int(conf.get("cql_port", 29042)),
        local_dc=conf.get("localDC"),
        keyspace=conf.get("keyspaceName") or conf.get("keyspace"),
        username=conf.get("username") or None,
        password=conf.get("password") or None,
        trust_store_password=conf.get("trustStorePassword"),
        key_store_password=conf.get("keyStorePassword"),
        ca_cert_pem=_member("ca.crt"),
        client_cert_pem=_member("cert"),
        client_key_pem=_member("key"),
        members=members,
    )


@dataclass
class CloudPlan:
    """Resolved cloud connection plan for a SinkConfig in cloud mode."""

    bundle: SecureBundle
    auth_username: str | None
    auth_password: str | None
    consistency_levels: dict[str, str]  # "ks.table" -> effective CL


def resolve_cloud(config: SinkConfig, opener=None) -> CloudPlan:
    """Resolve the full cloud connection plan from a parsed SinkConfig:
    parse + validate the bundle, merge credentials (explicit ``auth.*``
    settings win over legacy in-bundle credentials), and surface the
    per-table consistency levels after parse_sink_config's LOCAL_QUORUM
    clamp (CloudSniEndToEndIT.java:91-133)."""
    if not config.secure_connect_bundle:
        raise ConfigError("resolve_cloud requires cloud.secureConnectBundle")
    bundle = parse_secure_bundle(config.secure_connect_bundle, opener=opener)
    username = config.auth_username or bundle.username
    password = config.auth_password or bundle.password
    return CloudPlan(
        bundle=bundle,
        auth_username=username,
        auth_password=password,
        consistency_levels={
            f"{t.keyspace}.{t.table}": t.consistency_level for t in config.tables
        },
    )


# ---------------------------------------------------------------------------
# SNI endpoint math (the topology step of the cloud handshake)
# ---------------------------------------------------------------------------
#
# After parsing the bundle, the drivers contact
# ``bundle.metadata_service_url`` over TLS and receive the proxy topology:
# the SNI proxy address plus one host id per node.  Every node is then
# addressed as (proxy_address, server_name=<host_id>) — same socket
# endpoint, per-node TLS SNI.  This is the public Astra metadata format
# consumed by the open-source python/java drivers; CloudSniEndToEndIT
# composes it with the session build (proxy.getContactPoints()).


@dataclass(frozen=True)
class SniEndpoint:
    """One node behind the SNI proxy: TCP endpoint + TLS server_name."""

    address: str
    port: int
    server_name: str  # the node's host id


def parse_metadata_response(payload: bytes | str) -> tuple[str, str, list[str]]:
    """Parse the metadata-service JSON → (local_dc, sni_proxy_address,
    host_ids).  Shape (public Astra contract)::

        {"region": "...", "contact_info": {"type": "sni_proxy",
         "local_dc": "...", "contact_points": ["<host-id>", ...],
         "sni_proxy_address": "<host>:<port>"}}
    """
    try:
        doc = json.loads(payload)
        info = doc["contact_info"]
        local_dc = info["local_dc"]
        proxy = info["sni_proxy_address"]
        host_ids = list(info["contact_points"])
    except (ValueError, KeyError, TypeError) as exc:
        raise ConfigError(f"malformed cloud metadata response: {exc}") from exc
    if not host_ids:
        raise ConfigError("cloud metadata response lists no contact points")
    return local_dc, proxy, host_ids


def sni_endpoints(metadata_payload: bytes | str) -> list[SniEndpoint]:
    """Per-node SNI addresses from a metadata-service response: every host
    id maps to the same proxy socket with its own TLS server_name."""
    _, proxy, host_ids = parse_metadata_response(metadata_payload)
    if ":" in proxy:
        host, port_s = proxy.rsplit(":", 1)
        port = int(port_s)
    else:  # proxy without an explicit port uses the CQL default
        host, port = proxy, 9042
    return [SniEndpoint(address=host, port=port, server_name=h) for h in host_ids]
