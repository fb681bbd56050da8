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


#: sentinels for the packed identity key (never appear in corpus strings)
_SEP = "\x1f"
_NUL = "\x00"


def resolve_backends(
    tools,
    protocols,
    api_paths,
    ops,
    md5_id,
) -> Dict[str, pa.Array]:
    """Unique-level provider resolution for one partition.

    Inputs are Arrow string arrays (ChunkedArray or Array).  Rows without a
    tool resolve to null backends (only EXIT spans reach the provider chain,
    AbstractBackendEntityEnricher.java:96-104).

    The backend identity space is tiny (tools × protocols × templated
    paths), so ALL provider work — port/path/url formatting and the md5
    entity id — runs once per DISTINCT (tool, protocol, path, op) identity
    (the EntityCache analog, .../enrichers/cache/EntityCache.java) and is
    broadcast back with one dictionary ``take``.  This replaces the per-row
    ``np.char`` object-array formatting that dominated the enricher stage.
    """
    import pyarrow.compute as pc

    def _pa(a):
        if isinstance(a, np.ndarray):  # legacy callers / tests
            a = pa.array(a, pa.string())
        return a

    tools, protocols, api_paths, ops = map(_pa, (tools, protocols, api_paths, ops))
    key = pc.binary_join_element_wise(
        pc.fill_null(tools, _NUL),
        pc.fill_null(protocols, _NUL),
        pc.fill_null(api_paths, _NUL),
        pc.fill_null(ops, _NUL),
        _SEP,
    )
    if isinstance(key, pa.ChunkedArray):
        key = key.combine_chunks()
    enc = key.dictionary_encode()
    idx = enc.indices
    uniq = enc.dictionary.to_pylist()

    u_btype, u_host, u_port, u_path, u_url, u_bid = [], [], [], [], [], []
    for u in uniq:
        t, proto, ap, o = u.split(_SEP)
        if t == _NUL:
            u_btype.append(None)
            u_host.append(None)
            u_port.append(None)
            u_path.append(None)
            u_url.append(None)
            u_bid.append(None)
            continue
        spec = BACKEND_PROVIDERS.get(proto)
        if spec is None:  # unreachable via SpanKindEnricher; legacy parity
            btype, scheme, port, path = None, "None", None, None
        else:
            btype, scheme, port = spec.backend_type, spec.scheme, spec.port
            if spec.path_source == "api_path":
                path = None if ap == _NUL else ap
            elif spec.path_source == "op_slash":
                path = None if o == _NUL else "/" + o
            elif spec.path_source == "op":
                path = None if o == _NUL else o
            else:
                path = None
        authority = t if port is None else f"{t}:{port}"
        path_s = path or ""
        u_btype.append(btype)
        u_host.append(t)
        u_port.append(port)
        u_path.append(path)
        u_url.append(f"{scheme}://{authority}{path_s}")
        u_bid.append(md5_id("be_", f"{btype}:{authority}{path_s}"))

    def _take(values, typ):
        return pa.array(values, typ).take(idx)

    return {
        "backend_type": _take(u_btype, pa.string()),
        "backend_host": _take(u_host, pa.string()),
        "backend_port": _take(u_port, pa.int32()),
        "backend_path": _take(u_path, pa.string()),
        "backend_url": _take(u_url, pa.string()),
        "backend_id": _take(u_bid, pa.string()),
    }
