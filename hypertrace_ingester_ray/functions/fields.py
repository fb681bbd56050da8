"""Per-protocol field-generator dispatch (M8 depth).

The reference normalizes each protocol's span tags through a dispatch table
of attribute-key → field setters, with several source keys feeding one
target field in priority order (first writer wins):

- SqlFieldsGenerator.java:24-54   — SQL_QUERY | DB_STATEMENT → query, ...
- GrpcFieldsGenerator.java        — request body / metadata priority keys
- HttpFieldsGenerator.java        — url/path/method families
- ProtocolFieldsGenerator.java    — the shared dispatch loop

Here the same shape is a declarative registry: per protocol, per target
field, an ordered list of source keys in the open ``tags`` map; extraction
is vectorized (``map_get`` per unique source key + protocol-masked
coalesce), not a per-row loop over tag entries.
"""

from __future__ import annotations

from typing import Dict, List

import pyarrow as pa
import pyarrow.compute as pc

from .maps import QUERY_PARAM_PREFIX, map_get_many

_P = QUERY_PARAM_PREFIX  # the corpus's open-attribute namespace

#: protocol → target field → priority-ordered source keys (first non-null
#: wins, mirroring the multiple fieldGeneratorMap entries per setter).
#: The ≥3-key request families mirror the reference's priority lists
#: (HttpFieldsGenerator.java FULL_URL_ATTRIBUTES lines 84-130,
#: SqlFieldsGenerator.java:24-54 SQL_QUERY|DB_STATEMENT, GrpcFieldsGenerator
#: request-body-then-metadata): the protocol-specific key (stmt/body/proc,
#: sparse in the corpus) wins over the shared header key (hdr, sparse) over
#: the always-present fallback (q) — all three priority levels are
#: exercised and oracle-checked.
PROTOCOL_FIELD_PRIORITIES: Dict[str, Dict[str, List[str]]] = {
    "SQL": {
        # SQL_QUERY | DB_STATEMENT | fallback (SqlFieldsGenerator.java:27-33)
        "proto_request": [_P + "stmt", _P + "hdr", _P + "q"],
        "proto_params": [_P + "tag", _P + "page"],  # SQL_PARAMS
    },
    "GRPC": {
        # request body, then metadata, then fallback (GrpcFieldsGenerator)
        "proto_request": [_P + "body", _P + "hdr", _P + "q"],
        "proto_params": [_P + "page", _P + "tag"],
    },
    "PROC": {
        "proto_request": [_P + "proc", _P + "hdr", _P + "q"],
        "proto_params": [_P + "tag"],
    },
    "HTTP": {
        "proto_request": [_P + "hdr", _P + "q", _P + "page"],
        "proto_params": [_P + "tag", _P + "hdr"],
    },
}

TARGET_FIELDS = ("proto_request", "proto_params")


def generate_protocol_fields(
    tags_col, protocol_col, extracted: Dict[str, pa.Array] = None
) -> Dict[str, pa.Array]:
    """Apply the per-protocol dispatch over a batch: for every target field,
    coalesce the protocol's priority source keys out of the tags map, then
    select per row by protocol.

    ``extracted`` optionally supplies pre-extracted source-key columns (e.g.
    the scalar query_param_* columns an upstream enricher already built), so
    the dispatch skips the per-entry map scan."""
    tags = (
        tags_col
        if isinstance(tags_col, pa.ChunkedArray)
        else pa.chunked_array([tags_col])
    )
    n = len(tags)
    proto = (
        protocol_col.combine_chunks()
        if isinstance(protocol_col, pa.ChunkedArray)
        else protocol_col
    )
    # extract each distinct source key once, share across protocols
    all_keys = sorted(
        {k for f in PROTOCOL_FIELD_PRIORITIES.values() for ks in f.values() for k in ks}
    )
    extracted = dict(extracted or {})
    missing = [k for k in all_keys if k not in extracted]
    if missing:
        extracted.update(map_get_many(tags, missing))

    # one pass per field instead of protocols × (coalesce chain + if_else):
    # memoize each distinct coalesce chain (chains share suffixes across
    # protocols — [stmt,hdr,q] / [body,hdr,q] / [proc,hdr,q] reuse
    # coalesce(hdr, q)), compute each protocol mask once, then select with a
    # single case_when over all protocol branches.
    chain_cache: Dict[tuple, pa.Array] = {}

    def chain(keys: tuple) -> pa.Array:
        got = chain_cache.get(keys)
        if got is None:
            got = (
                extracted[keys[0]]
                if len(keys) == 1
                else pc.coalesce(extracted[keys[0]], chain(keys[1:]))
            )
            chain_cache[keys] = got
        return got

    masks = {
        name: pc.fill_null(pc.equal(proto, name), False)
        for name in PROTOCOL_FIELD_PRIORITIES
    }
    out: Dict[str, pa.Array] = {}
    for field in TARGET_FIELDS:
        conds, vals = [], []
        for proto_name, fields in PROTOCOL_FIELD_PRIORITIES.items():
            keys = fields.get(field, [])
            if keys:
                conds.append(masks[proto_name])
                vals.append(chain(tuple(keys)))
        out[field] = pc.case_when(
            pc.make_struct(*conds), *vals, pa.nulls(n, pa.string())
        )
    return out
