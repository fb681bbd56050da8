"""Backend provider registry (E7 depth).

The reference resolves backend entities for leaf EXIT spans through a chain
of protocol providers, each deriving the backend's type/uri/path/operation
from protocol-specific attributes and validating applicability
(/root/reference/hypertrace-trace-enricher/hypertrace-trace-enricher-impl/
src/main/java/org/hypertrace/traceenricher/enrichment/enrichers/backend/
AbstractBackendEntityEnricher.java:96-160; providers under
``enrichers/backend/provider/`` — Http, Grpc, Jdbc, Mongo, Redis, ...).

Transcript analog: a declarative ``{protocol-class → provider spec}`` table.
Each provider resolves, vectorized over the partition:

- ``backend_type``  — BackendType analog (JDBC / GRPC / HTTP / PROC)
- ``backend_host``  — the tool entity (the callee host)
- ``backend_port``  — protocol default (JdbcBackendProvider.getBackendUri
  formats host:port; RpcSemanticConventionUtils.getGrpcURI likewise)
- ``backend_path``  — HTTP: the request path; GRPC: '/'+op (the rpc method,
  GrpcBackendProvider.getBackendOperation); PROC: the op; JDBC: none
- ``backend_url``   — scheme://host[:port][path] display form
  (BackendEntityViewGenerator request-url concat)
- ``backend_id``    — deterministic md5 of (type, host:port, path) — the
  EDS-upsert FQN analog

The registry is data, not code: adding a provider = adding a dict row (the
reference's extension surface recast declaratively).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np
import pyarrow as pa


@dataclass(frozen=True)
class BackendProviderSpec:
    backend_type: str  # BackendType analog
    scheme: str  # uri scheme for backend_url
    port: Optional[int]  # protocol default port (None → no port component)
    path_source: Optional[str]  # "api_path" | "op_slash" | "op" | None


#: protocol class → provider (the provider-chain table)
BACKEND_PROVIDERS: Dict[str, BackendProviderSpec] = {
    "SQL": BackendProviderSpec("JDBC", "jdbc", 5432, None),
    "GRPC": BackendProviderSpec("GRPC", "grpc", 50051, "op_slash"),
    "HTTP": BackendProviderSpec("HTTP", "http", 80, "api_path"),
    "PROC": BackendProviderSpec("PROC", "proc", None, None),
}


def resolve_backends(
    tools: np.ndarray,
    protocols: np.ndarray,
    api_paths: np.ndarray,
    ops: np.ndarray,
    md5_id,
) -> Dict[str, pa.Array]:
    """Vectorized provider resolution for one partition.

    ``tools``/``protocols``/``api_paths``/``ops`` are object ndarrays (null =
    None).  Rows without a tool resolve to null backends (only EXIT spans
    reach the provider chain, AbstractBackendEntityEnricher.java:96-104).
    Returns the five backend_* columns; md5 work runs once per DISTINCT
    identity (EntityCache analog), not per row.
    """
    n = len(tools)
    has_tool = np.not_equal(tools, None)

    btype = np.full(n, None, dtype=object)
    port = np.full(n, None, dtype=object)
    path = np.full(n, None, dtype=object)
    scheme = np.full(n, None, dtype=object)
    for proto, spec in BACKEND_PROVIDERS.items():
        m = has_tool & (protocols == proto)
        if not m.any():
            continue
        btype[m] = spec.backend_type
        scheme[m] = spec.scheme
        if spec.port is not None:
            port[m] = spec.port
        if spec.path_source == "api_path":
            path[m] = api_paths[m]
        elif spec.path_source == "op_slash":
            pm = m & np.not_equal(ops, None)
            path[pm] = np.char.add("/", ops[pm].astype(str))
        elif spec.path_source == "op":
            pm = m & np.not_equal(ops, None)
            path[pm] = ops[pm]

    # host[:port] authority + scheme://authority[path] display url
    authority = np.full(n, None, dtype=object)
    url = np.full(n, None, dtype=object)
    rows = np.flatnonzero(has_tool)
    if len(rows):
        host_s = tools[rows].astype(str)
        port_s = np.where(
            np.not_equal(port[rows], None),
            np.char.add(":", np.where(port[rows] == None, 0, port[rows]).astype(str)),  # noqa: E711
            "",
        )
        path_s = np.where(np.not_equal(path[rows], None), path[rows], "").astype(str)
        auth = np.char.add(host_s, port_s)
        authority[rows] = auth
        url[rows] = np.char.add(
            np.char.add(scheme[rows].astype(str), "://"),
            np.char.add(auth, path_s),
        )

    # backend_id: md5 once per distinct (type, authority, path) identity
    ident = np.full(n, None, dtype=object)
    if len(rows):
        ident[rows] = np.char.add(
            np.char.add(btype[rows].astype(str), ":"),
            np.char.add(
                authority[rows].astype(str),
                np.where(np.not_equal(path[rows], None), path[rows], "").astype(str),
            ),
        )
    bid = np.full(n, None, dtype=object)
    if len(rows):
        uniq, inverse = np.unique(ident[rows].astype(str), return_inverse=True)
        mapped = np.array([md5_id("be_", u) for u in uniq], dtype=object)
        bid[rows] = mapped[inverse]

    port_i32 = pa.array(port, pa.int32())
    return {
        "backend_type": pa.array(btype, pa.string()),
        "backend_host": pa.array(np.where(has_tool, tools, None), pa.string()),
        "backend_port": port_i32,
        "backend_path": pa.array(path, pa.string()),
        "backend_url": pa.array(url, pa.string()),
        "backend_id": pa.array(bid, pa.string()),
    }
