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


def call_edges_view(t: pa.Table, ctx: ConversationContext) -> pa.Table:
    """One row per adjacent role transition within a conversation — the
    caller/callee edge join (ServiceCallViewGenerator.java:95-150, 'self-join
    on span event data' per ServiceCallView.avdl:3-6)."""
    n = ctx.n
    if n < 2:
        return schemas.CALL_EDGE_VIEW.empty_table()
    same_conv = ctx.conv_codes[1:] == ctx.conv_codes[:-1]
    role_change = ctx.roles[1:] != ctx.roles[:-1]
    callee_rows = np.flatnonzero(same_conv & role_change) + 1
    caller_rows = callee_rows - 1

    caller = t.select(
        ["tenant_id", "conv_id", "service_name", "role", "turn_idx"]
    ).take(pa.array(caller_rows))
    callee = t.select(["service_name", "role", "turn_idx", "ts", "dur_ms"]).take(
        pa.array(callee_rows)
    )
    err = ctx.col("is_error").astype(np.int64)

    return pa.table(
        {
            "tenant_id": caller["tenant_id"],
            "conv_id": caller["conv_id"],
            "caller_service": caller["service_name"],
            "callee_service": callee["service_name"],
            "caller_role": caller["role"],
            "callee_role": callee["role"],
            "caller_turn_idx": caller["turn_idx"],
            "callee_turn_idx": callee["turn_idx"],
            "ts": callee["ts"],
            "dur_ms": callee["dur_ms"],
            "num_errors": pa.array(err[caller_rows] + err[callee_rows]),
        }
    )


def per_tool_view(t: pa.Table, ctx: ConversationContext) -> pa.Table:
    """One row per tool turn (BackendEntityViewGenerator.java:43-63); the
    caller service is the previous turn's service within the conversation."""
    tools = ctx.col("tool")
    rows = np.flatnonzero(tools != None)  # noqa: E711
    if len(rows) == 0:
        return schemas.PER_TOOL_VIEW.empty_table()
    sub = t.select(
        ["tenant_id", "conv_id", "turn_idx", "backend_id", "tool", "op",
         "status_code", "api_status", "ts", "dur_ms"]
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
