"""Stage 4 — view fan-out (the hypertrace-view-generator analog).

The reference runs 6 Kafka jobs, each consuming the enriched trace stream and
flattening it into one Pinot-destined view
(/root/reference/hypertrace-view-generator/.../BaseViewGenerator.java:62-84,
one job per view per view-gen-*/application.conf).  Here all six views are
built vectorized from the same enriched partition table in a single pass —
one shuffle feeds every sink.

Each builder is ``(enriched_table, ctx) -> pa.Table`` and cites its reference
generator.  Row-count semantics (the conformance target, SURVEY.md §2.7):

  per_turn          1 row / turn            (SpanEventViewGenerator.java:51-307)
  per_role          1 row / role-run head   (RawServiceViewGenerator.java:25-101)
  per_conversation  1 row / conversation    (RawTraceViewGenerator.java:27-57)
  call_edges        1 row / role transition (ServiceCallViewGenerator.java:58-150)
  per_tool          1 row / tool turn       (BackendEntityViewGenerator.java:43-63)
  errors            1 row / error turn      (LogEventViewGenerator.java:43-111)
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..enrichers.base import ConversationContext
from ..stages.grouping import run_boundaries
from .. import schemas

SUMMARY_LEN = 120  # LogEventViewGenerator summary priority-key analog


# optional enrichment columns included in per_turn when their enricher ran
OPTIONAL_TURN_COLUMNS = [
    "client_family",
    "client_type",
    "space_ids",
    "conv_space_ids",
    "peer_service_name",
    "latency_sampled",
]


def per_turn_view(t: pa.Table, ctx: ConversationContext) -> pa.Table:
    names = list(schemas.PER_TURN_VIEW.names) + [
        c for c in OPTIONAL_TURN_COLUMNS if c in t.schema.names
    ]
    return t.select(names)


def per_role_view(t: pa.Table, ctx: ConversationContext) -> pa.Table:
    """One row per (conv, role)-run, fields from the run head
    (RawServiceViewGenerator.java:25-101: one row per ApiNode head event)."""
    roles = ctx.roles
    bounds = run_boundaries(ctx.conv_codes, roles)
    starts = bounds[:-1]
    lengths = np.diff(bounds)
    ends = bounds[1:] - 1

    ts = ctx.col("ts")
    dur = np.nan_to_num(
        ctx.col("dur_ms").astype(np.float64), nan=0.0
    )  # null dur → 0
    err = ctx.col("is_error").astype(np.int64)
    dur_sum = np.add.reduceat(dur, starts).astype(np.int64) if ctx.n else np.zeros(0, np.int64)
    err_sum = np.add.reduceat(err, starts) if ctx.n else np.zeros(0, np.int64)

    # take only the columns the view reads (the take is the hot kernel here)
    head = t.select(
        ["tenant_id", "conv_id", "service_name", "service_id", "role", "ts",
         "span_kind", "transaction_name"]
    ).take(pa.array(starts))
    kind = head["span_kind"].combine_chunks()
    num_calls = pc.cast(pc.equal(kind, "ENTRY"), pa.int64())

    return pa.table(
        {
            "tenant_id": head["tenant_id"],
            "conv_id": head["conv_id"],
            "service_name": head["service_name"],
            "service_id": head["service_id"],
            "role": head["role"],
            "start_ts": head["ts"],
            "end_ts": pa.array(ts[ends]).cast(pa.timestamp("us")),
            "dur_ms_sum": pa.array(dur_sum),
            "num_turns": pa.array(lengths.astype(np.int64)),
            "num_errors": pa.array(err_sum),
            "num_calls": num_calls,
            "transaction_name": head["transaction_name"],
        }
    )


def per_conversation_view(t: pa.Table, ctx: ConversationContext) -> pa.Table:
    """One row per conversation (RawTraceViewGenerator.java:27-57)."""
    bounds = ctx.bounds
    starts = bounds[:-1]
    lengths = np.diff(bounds)
    ends = bounds[1:] - 1

    ts = ctx.col("ts")
    err = ctx.col("is_error").astype(np.int64)
    tools = ctx.col("tool")
    ep, _ = ctx.episodes()

    err_sum = np.add.reduceat(err, starts) if ctx.n else np.zeros(0, np.int64)
    exit_sum = (
        np.add.reduceat((tools != None).astype(np.int64), starts)  # noqa: E711
        if ctx.n
        else np.zeros(0, np.int64)
    )
    # distinct services per conversation (HashSet analog,
    # RawTraceViewGenerator.java:46-52) — unique (conv, service) pairs
    svc = t["service_id"].combine_chunks().dictionary_encode()
    svc_codes = svc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    k = svc_codes.max(initial=0) + 1
    # conv codes are 0..n_convs-1 in segment order (dictionary_encode of a
    # sorted column assigns codes in first-appearance order)
    uniq_pairs = np.unique(ctx.conv_codes * k + svc_codes)
    n_svc = np.bincount(uniq_pairs // k, minlength=ctx.n_convs)

    head = t.select(["tenant_id", "conv_id", "transaction_name"]).take(
        pa.array(starts)
    )
    start_ts = ts[starts]
    end_ts = ts[ends]
    duration_ms = ((end_ts.astype(np.int64) - start_ts.astype(np.int64)) // 1000).astype(
        np.int64
    )

    return pa.table(
        {
            "tenant_id": head["tenant_id"],
            "conv_id": head["conv_id"],
            "transaction_name": head["transaction_name"],
            "num_turns": pa.array(lengths.astype(np.int64)),
            "num_services": pa.array(n_svc.astype(np.int64)),
            "num_episodes": pa.array((ep[ends] + 1).astype(np.int64)),
            "num_errors": pa.array(err_sum),
            "num_exit_calls": pa.array(exit_sum),
            "start_ts": pa.array(start_ts).cast(pa.timestamp("us")),
            "end_ts": pa.array(end_ts).cast(pa.timestamp("us")),
            "duration_ms": pa.array(duration_ms),
            "has_error": pa.array(err_sum > 0),
        }
    )


def _edge_rows(
    t: pa.Table,
    ctx: ConversationContext,
    *,
    edge_type: str,
    caller_rows: np.ndarray = None,
    callee_rows: np.ndarray = None,
    event_rows: np.ndarray = None,
    backend: bool = False,
) -> pa.Table:
    """Assemble one edge-scenario slice in the CALL_EDGE_VIEW layout.

    Pair scenarios pass (caller_rows, callee_rows); single-event scenarios
    pass event_rows on exactly one side semantics: root/non-root entries are
    callee-side (buildEntrySpanView), backends are caller-side
    (buildExitSpanView)."""
    err = ctx.col("is_error").astype(np.int64)
    if caller_rows is not None and callee_rows is not None:
        base = callee_rows
        num_err = err[caller_rows] + err[callee_rows]
    else:
        base = event_rows
        caller_rows = event_rows if backend else None
        callee_rows = None if backend else event_rows
        num_err = err[base]
    m = len(base)

    def side(rows, col):
        if rows is None:
            return pa.nulls(m, t.schema.field(col).type)
        return t[col].take(pa.array(rows))

    ev = t.select(
        ["tenant_id", "conv_id", "ts", "dur_ms", "status_code"]
    ).take(pa.array(base))
    if backend:
        # getBackendRequestUrl analog (ServiceCallViewGenerator.java:322-345):
        # the provider-chain display url (scheme://host[:port][path],
        # enrichers/backend_providers.py)
        url = t["backend_url"].take(pa.array(base))
        backend_id = t["backend_id"].take(pa.array(base))
    else:
        url = pa.nulls(m, pa.string())
        backend_id = pa.nulls(m, pa.string())
    return pa.table(
        {
            "tenant_id": ev["tenant_id"],
            "conv_id": ev["conv_id"],
            "edge_type": pa.array([edge_type] * m, pa.string()),
            "caller_service": side(caller_rows, "service_name"),
            "callee_service": side(callee_rows, "service_name"),
            "caller_role": side(caller_rows, "role"),
            "callee_role": side(callee_rows, "role"),
            "caller_turn_idx": side(caller_rows, "turn_idx"),
            "callee_turn_idx": side(callee_rows, "turn_idx"),
            "ts": ev["ts"],
            "dur_ms": ev["dur_ms"],
            "num_errors": pa.array(num_err),
            "status_code": ev["status_code"],
            "backend_id": backend_id,
            "request_url": url,
        }
    )


def call_edges_view(t: pa.Table, ctx: ConversationContext) -> pa.Table:
    """ServiceCallView with the reference's FOUR edge scenarios
    (ServiceCallViewGenerator.java:58-150), translated to the conversation
    graph where ApiNode = role-run, entry boundary = user run head, exit
    boundary = tool turn:

    1. ``api_edge``      — ApiNodeEventEdge: each adjacent role transition;
                           caller = last turn of the previous run (exit side),
                           callee = head of the next run (entry side).
    2. ``root_entry``    — entry boundary with no incoming edge: the first
                           turn of a conversation when it is a user turn.
    3. ``backend``       — exit boundary with no outgoing edge: tool turns
                           that are not an api_edge source (mid-run tools and
                           conversation-final runs); carries backend_id and
                           the protocol://host+path request_url concat.
    4. ``non_root_entry``— ApiNode without an entry boundary but with exits:
                           conversations that start before any user head and
                           contain a tool turn there; the root ancestor (the
                           conversation's first turn) is emitted once.
    """
    n = ctx.n
    if n == 0:
        return schemas.CALL_EDGE_VIEW.empty_table()
    roles = ctx.roles
    tools = ctx.col("tool")
    idx = np.arange(n, dtype=np.int64)

    # scenario 1: adjacent role transitions
    if n > 1:
        same_conv = ctx.conv_codes[1:] == ctx.conv_codes[:-1]
        role_change = roles[1:] != roles[:-1]
        callee_rows = np.flatnonzero(same_conv & role_change) + 1
        caller_rows = callee_rows - 1
    else:
        callee_rows = caller_rows = np.zeros(0, dtype=np.int64)
    s1 = _edge_rows(
        t, ctx, edge_type="api_edge",
        caller_rows=caller_rows, callee_rows=callee_rows,
    )

    # scenario 2: root entries — conversation-first user turns
    firsts = ctx.bounds[:-1]
    root_entry_rows = firsts[roles[firsts] == "user"]
    s2 = _edge_rows(t, ctx, edge_type="root_entry", event_rows=root_entry_rows)

    # scenario 3: backends — tool turns that source no api_edge
    is_source = np.zeros(n, dtype=bool)
    is_source[caller_rows] = True
    backend_rows = np.flatnonzero(np.not_equal(tools, None) & ~is_source)
    s3 = _edge_rows(
        t, ctx, edge_type="backend", event_rows=backend_rows, backend=True
    )

    # scenario 4: non-root entries — convs starting before any user head
    # with >=1 exit (tool) there; emit the root ancestor once per conv
    heads = ctx.role_run_start() & (roles == "user")
    first_head = np.where(heads, idx, np.iinfo(np.int64).max)
    first_head_per_conv = np.minimum.reduceat(first_head, firsts)
    tool_pre = np.not_equal(tools, None) & (
        idx < np.repeat(first_head_per_conv, np.diff(ctx.bounds))
    )
    has_pre_exit = np.add.reduceat(tool_pre.astype(np.int64), firsts) > 0
    non_root = firsts[(roles[firsts] != "user") & has_pre_exit]
    s4 = _edge_rows(t, ctx, edge_type="non_root_entry", event_rows=non_root)

    out = pa.concat_tables([s1, s2, s3, s4]).combine_chunks()
    return out.cast(schemas.CALL_EDGE_VIEW)


def per_tool_view(t: pa.Table, ctx: ConversationContext) -> pa.Table:
    """One row per tool turn (BackendEntityViewGenerator.java:43-63); the
    caller service is the previous turn's service within the conversation."""
    tools = ctx.col("tool")
    rows = np.flatnonzero(tools != None)  # noqa: E711
    if len(rows) == 0:
        return schemas.PER_TOOL_VIEW.empty_table()
    sub = t.select(
        ["tenant_id", "conv_id", "turn_idx", "backend_id", "tool", "op",
         "status_code", "api_status", "ts", "dur_ms",
         "backend_type", "backend_port", "backend_url"]
    ).take(pa.array(rows))
    svc = ctx.col("service_name")
    prev_rows = rows - 1
    valid_prev = (rows > 0) & (
        ctx.conv_codes[np.maximum(prev_rows, 0)] == ctx.conv_codes[rows]
    )
    caller = np.where(valid_prev, svc[np.maximum(prev_rows, 0)], None)

    return pa.table(
        {
            "tenant_id": sub["tenant_id"],
            "conv_id": sub["conv_id"],
            "turn_idx": sub["turn_idx"],
            "backend_id": sub["backend_id"],
            "tool": sub["tool"],
            "op": sub["op"],
            "status_code": sub["status_code"],
            "api_status": sub["api_status"],
            "caller_service": pa.array(caller, pa.string()),
            "ts": sub["ts"],
            "dur_ms": sub["dur_ms"],
            "backend_type": sub["backend_type"],
            "backend_port": sub["backend_port"],
            "request_url": sub["backend_url"],
        }
    )


def errors_view(t: pa.Table, ctx: ConversationContext) -> pa.Table:
    """One row per error turn (LogEventViewGenerator.java:43-111); summary is
    the truncated text (summary-key priority analog, line 39-40)."""
    mask = ctx.col("is_error")
    rows = np.flatnonzero(mask)
    if len(rows) == 0:
        return schemas.ERROR_VIEW.empty_table()
    sub = t.select(
        ["tenant_id", "conv_id", "turn_idx", "role", "tool", "status_code",
         "status_message", "text", "ts"]
    ).take(pa.array(rows))
    summary = pc.utf8_slice_codeunits(sub["text"], 0, SUMMARY_LEN)
    return pa.table(
        {
            "tenant_id": sub["tenant_id"],
            "conv_id": sub["conv_id"],
            "turn_idx": sub["turn_idx"],
            "role": sub["role"],
            "tool": sub["tool"],
            "status_code": sub["status_code"],
            "status_message": sub["status_message"],
            "summary": summary,
            "ts": sub["ts"],
        }
    )


VIEW_BUILDERS: Dict[str, Callable[[pa.Table, ConversationContext], pa.Table]] = {
    "per_turn": per_turn_view,
    "per_role": per_role_view,
    "per_conversation": per_conversation_view,
    "call_edges": call_edges_view,
    "per_tool": per_tool_view,
    "errors": errors_view,
}
