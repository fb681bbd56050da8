"""Stage 1 — vectorized parse / normalize (the span-normalizer analog).

Reference semantics reimplemented over Arrow batches:

- ``JaegerSpanPreProcessor`` per-span tag normalization + tenant resolution +
  drop-filtering (/root/reference/span-normalizer/span-normalizer/src/main/
  java/org/hypertrace/core/spannormalizer/jaeger/JaegerSpanPreProcessor.java:100-128)
- ``EventBuilder.buildEvent`` first-class field projection + Duration metric
  (.../util/EventBuilder.java:30-119)
- ``HttpFieldsGenerator`` priority-key URL/method/status/size extraction
  (.../fieldgenerators/HttpFieldsGenerator.java:84-150) — here a single
  compiled grok regex over the turn ``text`` via ``pc.extract_regex``
- ``ServiceNamer`` first-match service-name resolution
  (.../jaeger/ServiceNamer.java:29-48) — ``coalesce(tool, role)``
- ``TenantIdHandler`` static default tenant (.../TenantIdHandler.java:33-81)
- ``SpanFilter`` / ``SpanDropFilter`` OR-of-AND drop rules with
  EQ/NEQ/CONTAINS/EXISTS/NOT_EXISTS operators
  (.../jaeger/SpanFilter.java:123-155,209-267)

Everything is a pure ``pa.Table → pa.Table`` function suitable for
``ds.map_batches(..., batch_format="pyarrow")`` — no Python row loops.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Literal, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

# One grok pattern for the request-log-shaped turn text.  Named groups become
# first-class columns (the FieldsGenerator dispatch analog,
# FieldsGenerator.java:69-105).
GROK_PATTERN = (
    r"^(?P<http_method>[A-Z]+) (?P<api_path>[^?\s]+)(?:\?(?P<http_query>\S*))?"
    r" HTTP/1\.1"
    r" status=(?P<status_code>\d+) dur_ms=(?P<dur_ms>\d+) bytes=(?P<bytes>\d+)"
    r"(?: grpc_status=(?P<grpc_status>\d+))?$"
)
OP_PATTERN = r"^/api/v1/(?P<op>[a-z]+)"

DEFAULT_TENANT = "default-tenant"


# ---------------------------------------------------------------------------
# drop rules (F1/F2 analog)
# ---------------------------------------------------------------------------

DropOp = Literal["EQ", "NEQ", "CONTAINS", "EXISTS", "NOT_EXISTS"]


@dataclass(frozen=True)
class DropCondition:
    """One relational condition over a column (SpanDropFilter.java:1-62)."""

    column: str
    op: DropOp
    value: Optional[str] = None


@dataclass(frozen=True)
class NormalizeConfig:
    tenant_id: str = DEFAULT_TENANT
    # OR of ANDs: a row matching every condition of any rule is dropped
    # (SpanFilter.java:123-155).
    drop_rules: Sequence[Sequence[DropCondition]] = ()
    # bypass predicate (ByPassPredicate.java:28-44): rows matching skip
    # grouping/enrichment and are routed straight to the bypass sink.
    bypass_rules: Sequence[Sequence[DropCondition]] = ()


def _condition_mask(batch: pa.Table, cond: DropCondition) -> pa.ChunkedArray:
    col = batch[cond.column]
    if cond.op == "EQ":
        m = pc.equal(col, cond.value)
    elif cond.op == "NEQ":
        m = pc.not_equal(col, cond.value)
    elif cond.op == "CONTAINS":
        m = pc.match_substring(col, cond.value)
    elif cond.op == "EXISTS":
        m = pc.is_valid(col)
    elif cond.op == "NOT_EXISTS":
        m = pc.is_null(col)
    else:  # pragma: no cover
        raise ValueError(f"unknown drop op {cond.op}")
    return pc.fill_null(m, False) if cond.op not in ("EXISTS", "NOT_EXISTS") else m


def rules_mask(batch: pa.Table, rules: Sequence[Sequence[DropCondition]]) -> Optional[pa.ChunkedArray]:
    """True where a row matches any rule (each rule = AND of conditions)."""
    if not rules:
        return None
    any_rule = None
    for rule in rules:
        rule_mask = None
        for cond in rule:
            m = _condition_mask(batch, cond)
            rule_mask = m if rule_mask is None else pc.and_(rule_mask, m)
        any_rule = rule_mask if any_rule is None else pc.or_(any_rule, rule_mask)
    return any_rule


# ---------------------------------------------------------------------------
# the parse kernel
# ---------------------------------------------------------------------------


LIGHT_COLUMNS = {"tenant_id", "conv_id", "turn_idx", "role", "text", "tool", "ts"}


def needs_extraction_for_rules(config: NormalizeConfig) -> bool:
    """True when any drop/bypass rule references a grok-extracted column, in
    which case extraction must run before filtering (pre-shuffle)."""
    for rules in (config.drop_rules, config.bypass_rules):
        for rule in rules:
            for cond in rule:
                if cond.column not in LIGHT_COLUMNS:
                    return True
    return False


def drop_poison_rows(batch: pa.Table) -> pa.Table:
    """Poison-pill policy (JaegerSpanPreProcessor.java:88-96 swallows bad
    records and counts them, never failing the job): rows with a null
    grouping key, turn index or timestamp cannot be ordered or grouped —
    drop them instead of corrupting the shuffle."""
    mask = pc.and_(
        pc.and_(pc.is_valid(batch["conv_id"]), pc.is_valid(batch["turn_idx"])),
        pc.is_valid(batch["ts"]),
    )
    if pc.all(mask).as_py():
        return batch
    return batch.filter(mask)


def normalize_light_batch(
    batch: pa.Table, config: NormalizeConfig = NormalizeConfig()
) -> pa.Table:
    """Pre-shuffle normalize: tenant + drop rules only, narrow columns.

    The grok extraction runs post-shuffle (extract_batch) so the all-to-all
    exchange moves ~40% fewer bytes per row — extraction output is derived
    data and cheaper to recompute after the move than to ship."""
    batch = drop_poison_rows(batch)
    drop = rules_mask(batch, config.drop_rules)
    if drop is not None:
        batch = batch.filter(pc.invert(drop))
    n = batch.num_rows
    return pa.table(
        {
            "tenant_id": pa.array([config.tenant_id] * n, pa.string()),
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int32()),
            "role": batch["role"],
            "text": batch["text"],
            "tool": batch["tool"],
            "ts": batch["ts"],
        }
    )


def extract_batch(batch: pa.Table) -> pa.Table:
    """Grok extraction over a (possibly light-normalized) batch → full
    NORMALIZED_TURNS layout.  Vectorized; idempotent on already-extracted
    input (detected by column presence)."""
    if "status_code" in batch.schema.names:
        return batch
    extracted = pc.extract_regex(batch["text"], GROK_PATTERN)
    http_method = pc.struct_field(extracted, "http_method")
    api_path = pc.struct_field(extracted, "api_path")
    # optional group: unmatched → "" from RE2; normalize to null
    http_query = pc.if_else(
        pc.equal(pc.struct_field(extracted, "http_query"), ""),
        pa.nulls(batch.num_rows, pa.string()),
        pc.struct_field(extracted, "http_query"),
    )
    status_code = pc.cast(pc.struct_field(extracted, "status_code"), pa.int32())
    dur_ms = pc.cast(pc.struct_field(extracted, "dur_ms"), pa.int64())
    bytes_ = pc.cast(pc.struct_field(extracted, "bytes"), pa.int64())
    grpc_raw = pc.struct_field(extracted, "grpc_status")
    grpc_status_code = pc.cast(
        pc.if_else(
            pc.equal(grpc_raw, ""), pa.nulls(batch.num_rows, pa.string()), grpc_raw
        ),
        pa.int32(),
    )
    op = pc.struct_field(pc.extract_regex(api_path, OP_PATTERN), "op")
    service_name = pc.coalesce(batch["tool"], batch["role"])
    is_error = pc.fill_null(pc.greater_equal(status_code, 400), False)
    return pa.table(
        {
            "tenant_id": batch["tenant_id"],
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "role": batch["role"],
            "text": batch["text"],
            "tool": batch["tool"],
            "ts": batch["ts"],
            "http_method": http_method,
            "api_path": api_path,
            "http_query": http_query,
            "op": op,
            "status_code": status_code,
            "grpc_status_code": grpc_status_code,
            "dur_ms": dur_ms,
            "bytes": bytes_,
            "service_name": service_name,
            "is_error": is_error,
        }
    )


def normalize_batch(batch: pa.Table, config: NormalizeConfig = NormalizeConfig()) -> pa.Table:
    """transcripts batch → NORMALIZED_TURNS batch (drop-filtered)."""
    batch = drop_poison_rows(batch)
    drop = rules_mask(batch, config.drop_rules)
    if drop is not None:
        batch = batch.filter(pc.invert(drop))

    n = batch.num_rows
    extracted = pc.extract_regex(batch["text"], GROK_PATTERN)
    http_method = pc.struct_field(extracted, "http_method")
    api_path = pc.struct_field(extracted, "api_path")
    http_query = pc.if_else(
        pc.equal(pc.struct_field(extracted, "http_query"), ""),
        pa.nulls(n, pa.string()),
        pc.struct_field(extracted, "http_query"),
    )
    status_code = pc.cast(pc.struct_field(extracted, "status_code"), pa.int32())
    dur_ms = pc.cast(pc.struct_field(extracted, "dur_ms"), pa.int64())
    bytes_ = pc.cast(pc.struct_field(extracted, "bytes"), pa.int64())
    grpc_raw = pc.struct_field(extracted, "grpc_status")
    grpc_status_code = pc.cast(
        pc.if_else(pc.equal(grpc_raw, ""), pa.nulls(n, pa.string()), grpc_raw),
        pa.int32(),
    )
    op = pc.struct_field(pc.extract_regex(api_path, OP_PATTERN), "op")

    service_name = pc.coalesce(batch["tool"], batch["role"])
    is_error = pc.fill_null(pc.greater_equal(status_code, 400), False)

    cols = {
        "tenant_id": pa.array([config.tenant_id] * n, pa.string()),
        "conv_id": batch["conv_id"],
        "turn_idx": pc.cast(batch["turn_idx"], pa.int32()),
        "role": batch["role"],
        "text": batch["text"],
        "tool": batch["tool"],
        "ts": batch["ts"],
        "http_method": http_method,
        "api_path": api_path,
        "http_query": http_query,
        "op": op,
        "status_code": status_code,
        "grpc_status_code": grpc_status_code,
        "dur_ms": dur_ms,
        "bytes": bytes_,
        "service_name": service_name,
        "is_error": is_error,
    }
    return pa.table(cols)


def normalize(ds: Dataset, config: NormalizeConfig = NormalizeConfig()) -> Dataset:
    return ds.map_batches(
        normalize_batch, batch_format="pyarrow", fn_kwargs={"config": config}
    )


def normalize_light(ds: Dataset, config: NormalizeConfig = NormalizeConfig()) -> Dataset:
    return ds.map_batches(
        normalize_light_batch, batch_format="pyarrow", fn_kwargs={"config": config}
    )


def split_bypass(ds: Dataset, config: NormalizeConfig):
    """Route bypass rows to their own branch (SpanNormalizer.java:66-70).

    Returns ``(main, bypass)`` datasets; ``bypass`` is None when unconfigured.
    """
    if not config.bypass_rules:
        return ds, None

    def _keep_main(batch: pa.Table) -> pa.Table:
        m = rules_mask(batch, config.bypass_rules)
        return batch.filter(pc.invert(m))

    def _keep_bypass(batch: pa.Table) -> pa.Table:
        m = rules_mask(batch, config.bypass_rules)
        return batch.filter(m)

    return (
        ds.map_batches(_keep_main, batch_format="pyarrow"),
        ds.map_batches(_keep_bypass, batch_format="pyarrow"),
    )
