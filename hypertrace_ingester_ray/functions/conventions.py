"""Semantic-convention helpers (M12) — the vectorized analog of the
reference's ~2.5 kLoC scalar convention-utils family:

- ``HttpSemanticConventionUtils.java`` (url/scheme/host/path/status families)
- ``RpcSemanticConventionUtils.java``  (rpc status / system)
- ``DbSemanticConventionUtils.java``   (db url building)
- ``SpanSemanticConventionUtils.java`` (peer ip:port)

The reference resolves each logical field from priority-ordered attribute
keys one span at a time; here every helper is a pure Arrow-kernel function
over whole columns.  The per-protocol PRIORITY dispatch lives in
``functions/fields.py``; this module holds the scalar-semantics helpers the
generators and view builders share.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _arr(x):
    return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x


def build_url(scheme, host, path=None) -> pa.Array:
    """``scheme://host[path]`` (getBackendRequestUrl /
    DbSemanticConventionUtils.getDbUrl concat semantics); null rows stay
    null."""
    parts = [pc.utf8_lower(_arr(scheme)), "://", _arr(host)]
    if path is not None:
        parts.append(pc.fill_null(_arr(path), ""))
    parts.append("")
    return pc.binary_join_element_wise(*parts)


def split_host_port(authority) -> Tuple[pa.Array, pa.Array]:
    """``host[:port]`` → (host, port:int32|null)
    (SpanSemanticConventionUtils peer ip:port parsing)."""
    a = _arr(authority)
    ex = pc.extract_regex(a, r"^(?P<host>[^:]*)(?::(?P<port>\d+))?$")
    host = pc.struct_field(ex, "host")
    port_s = pc.struct_field(ex, "port")
    port = pc.cast(
        pc.if_else(pc.equal(port_s, ""), pa.nulls(len(a), pa.string()), port_s),
        pa.int32(),
    )
    return host, port


def status_class(status_code) -> pa.Array:
    """HTTP status family: 100→'1xx' … 500→'5xx', null-safe
    (HttpCodeMapper / HttpSemanticConventionUtils status family)."""
    s = _arr(status_code)
    hundreds = pc.divide(pc.cast(s, pa.int32()), 100)
    return pc.binary_join_element_wise(
        pc.cast(hundreds, pa.string()), "xx", ""
    )


def is_client_error(status_code) -> pa.Array:
    """4xx (HttpCodeMapper.isClientError analog)."""
    s = pc.cast(_arr(status_code), pa.int32())
    return pc.and_(pc.greater_equal(s, 400), pc.less(s, 500))


def is_server_error(status_code) -> pa.Array:
    """5xx (HttpCodeMapper.isServerError analog)."""
    s = pc.cast(_arr(status_code), pa.int32())
    return pc.greater_equal(s, 500)


def full_http_url(method, host, path, query=None) -> pa.Array:
    """``METHOD http://host/path[?query]`` display form
    (HttpSemanticConventionUtils.getHttpUrl rebuild path)."""
    parts = [
        _arr(method),
        " http://",
        _arr(host),
        pc.fill_null(_arr(path), ""),
    ]
    if query is not None:
        q = _arr(query)
        parts.append(
            pc.if_else(
                pc.is_null(q),
                pa.array([""] * len(q), pa.string()),
                pc.binary_join_element_wise("?", q, ""),
            )
        )
    parts.append("")
    return pc.binary_join_element_wise(*parts)
