"""Conversation-tree visualizer — the trace-visualizer analog.

Reference: hypertrace-trace-visualizer converts one StructuredTrace into a
D3-consumable nested-children JSON and writes it to ``/tmp/<trace-id>.json``,
one JSON object per root span, roots being spans with no parent OR spans
whose parent is missing from the trace (broken-trace case)
(/root/reference/hypertrace-trace-enricher/hypertrace-trace-visualizer/src/
main/java/org/hypertrace/traceenricher/util/TraceUI.java:38-146); each node
flattens the span's raw + enriched attribute maps into the JSON object
(TraceUI.java:90-110).

Here a "trace" is a conversation and "spans" are turns.  The parent
relationship mirrors the engine's call-graph semantics (stages/views.py
call_edges scenarios): a tool turn is a LEAF hanging off the turn that
invoked it (the last preceding non-tool turn — per_tool_view's "caller is
the previous turn" rule), and non-tool turns chain through the preceding
non-tool turn.  A turn whose every predecessor is a tool turn has no
reachable invoker and becomes a root — the exact analog of TraceUI's
missing-parent-makes-root rule (TraceUI.java:117-125).

Two surfaces:

- ``tree_edges(table)`` — vectorized (conv_id, turn_idx, parent_turn_idx)
  edge list, SQL-mirrorable (the driver oracle checks it value-level);
- ``conversation_tree_json(table)`` / ``export_conversation_json(...)`` —
  the nested D3 JSON with flattened attributes, written one root per line
  to ``<dest>/<conv_id>.json`` exactly as TraceUI.writeToFile does.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa


def _parent_rows(conv_codes: np.ndarray, is_tool: np.ndarray) -> np.ndarray:
    """Global row index of each row's parent (-1 = root), vectorized.

    parent(i) = last j < i in the same conversation with is_tool[j] False.
    Input must be sorted by (conv_id, turn_idx).  Uses a keyed running max
    so conversation boundaries reset for free: key = conv_code*(n+2) +
    (row+1 if invokable else 0); a new conversation's base exceeds every
    prior key, so the prefix max can never leak across conversations.
    """
    n = len(conv_codes)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    base = np.int64(n + 2)
    rows = np.arange(n, dtype=np.int64)
    keyed = conv_codes * base + np.where(is_tool, 0, rows + 1)
    runmax = np.maximum.accumulate(keyed)
    parent_key = np.empty(n, dtype=np.int64)
    parent_key[0] = -1
    parent_key[1:] = runmax[:-1]
    parent_conv = parent_key // base
    parent_slot = parent_key - parent_conv * base
    ok = (parent_key >= 0) & (parent_conv == conv_codes) & (parent_slot > 0)
    return np.where(ok, parent_slot - 1, np.int64(-1))


def tree_edges(part: pa.Table) -> pa.Table:
    """(conv_id, turn_idx, parent_turn_idx) for one sorted partition of
    complete conversations — the flat projection of the visualizer tree.
    NULL parent_turn_idx marks a root."""
    n = part.num_rows
    if n == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "parent_turn_idx": pa.array([], pa.int32()),
            }
        )
    conv = part["conv_id"].combine_chunks().dictionary_encode()
    conv_codes = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    is_tool = part["tool"].combine_chunks().is_valid().to_numpy(
        zero_copy_only=False
    )
    parents = _parent_rows(conv_codes, is_tool)
    turn = part["turn_idx"].combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    parent_turn = np.where(parents >= 0, turn[np.maximum(parents, 0)], -1)
    return pa.table(
        {
            "conv_id": part["conv_id"],
            "turn_idx": part["turn_idx"],
            "parent_turn_idx": pa.array(
                np.where(parent_turn >= 0, parent_turn, None), pa.int32()
            ),
        }
    )


# columns that form the node identity rather than its attribute map
_STRUCTURAL = {"conv_id", "turn_idx"}


def _flatten_attributes(part: pa.Table, row: int) -> dict:
    """TraceUI.flattenAttributes analog: merge every non-null column value
    (raw and enriched alike — the sink schema carries both) into one flat
    dict, stringified the way AttributeValue.getValue() is."""
    out = {"eventId": f"{part['conv_id'][row].as_py()}:{part['turn_idx'][row].as_py()}"}
    for name in part.column_names:
        if name in _STRUCTURAL:
            continue
        v = part[name][row].as_py()
        if v is not None:
            out[name] = v if isinstance(v, str) else str(v)
    return out


def conversation_tree_json(part: pa.Table) -> List[dict]:
    """Build the nested D3 JSON for ONE conversation (sorted by turn_idx):
    one dict per root, each with id/name/parent/attributes/children exactly
    as TraceUI.build emits (TraceUI.java:42-86)."""
    n = part.num_rows
    if n == 0:
        return []
    conv_codes = np.zeros(n, dtype=np.int64)
    is_tool = part["tool"].combine_chunks().is_valid().to_numpy(
        zero_copy_only=False
    )
    parents = _parent_rows(conv_codes, is_tool)
    conv_id = part["conv_id"][0].as_py()
    turn = part["turn_idx"].to_pylist()
    roles = part["role"].to_pylist()

    def node_id(i: int) -> str:
        return f"{conv_id}:{turn[i]}"

    nodes = []
    for i in range(n):
        nodes.append(
            {
                "id": node_id(i),
                "name": roles[i] if roles[i] is not None else "",
                "parent": node_id(int(parents[i])) if parents[i] >= 0 else "null",
                "attributes": _flatten_attributes(part, i),
                "children": [],
            }
        )
    roots = []
    for i in range(n):
        if parents[i] >= 0:
            nodes[int(parents[i])]["children"].append(nodes[i])
        else:
            roots.append(nodes[i])
    return roots


def export_conversation_json(
    part: pa.Table, dest_dir: str = "/tmp"
) -> Sequence[str]:
    """Write ``<dest>/<conv_id>.json`` per conversation present in ``part``
    (sorted by (conv_id, turn_idx)), one root JSON object per line —
    TraceUI.writeToFile's format (TraceUI.java:130-141).  Returns the paths.
    Debug tooling: run it on a driver-side slice (one conversation fetched
    by filter), never on the full dataset."""
    os.makedirs(dest_dir, exist_ok=True)
    if part.num_rows == 0:  # np.r_[True, [], True] would yield one
        return []  # spurious empty slice and an IndexError below
    paths = []
    conv = part["conv_id"].combine_chunks().dictionary_encode()
    codes = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    bounds = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1], True])
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        sub = part.slice(lo, hi - lo)
        conv_id = sub["conv_id"][0].as_py()
        path = os.path.join(dest_dir, f"{conv_id}.json")
        with open(path, "w") as f:
            for root in conversation_tree_json(sub):
                f.write(json.dumps(root))
                f.write("\n")
        paths.append(path)
    return paths
