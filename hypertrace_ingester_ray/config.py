"""Config loading — the typesafe-config / config-service analog.

The reference drives drop filters, exclude rules, space rules, service-name
overrides and rate limits from reloadable config
(/root/reference/span-normalizer/.../jaeger/ExcludeSpanRulesCache.java,
SpaceRulesCachingClient.java).  Here the same rule shapes load from a JSON
file once per run; workers receive them via the (broadcast) PipelineConfig.

JSON shape:

{
  "tenant_id": "acme",
  "tenant_column": null,
  "drop_rules": [
    [{"column": "role", "op": "EQ", "value": "system"}],
    {"and": [{"column": "tool", "op": "EXISTS"},
             {"or": [{"column": "role", "op": "EQ", "value": "tool"},
                     {"column": "text", "op": "CONTAINS", "value": "boom"}]}]}
  ],
  "bypass_rules": [],
  "space_rules": [{"space_id": "errors", "conditions": [
      {"column": "is_error", "op": "EQ", "value": true}]}],
  "rate_limit": {"max_rows_per_window": 1000, "window_sec": 60},
  "max_turns_per_conv": 50000,
  "session_gap_sec": 1800,
  "num_partitions": 128,
  "enable_client_info": true,
  "peer_correlation": false,
  "latency_sample_pct": 10
}

Each drop/bypass rule is either the classic AND-list of conditions or an
arbitrarily nested {"and": [...]} / {"or": [...]} tree — the reference's
LogicalSpanFilterExpression shape (ExcludeSpanRuleEvaluator.java:42-62), so
reference-shaped exclude configs port 1:1.
"""

from __future__ import annotations

import json
from typing import Any, Dict

from .enrichers.extended import SpaceRule
from .pipelines.ingest import PipelineConfig
from .stages.filters import RateLimitConfig
from .stages.normalize import DropCondition, NormalizeConfig, RuleTree


_VALID_OPS = {"EQ", "NEQ", "CONTAINS", "EXISTS", "NOT_EXISTS"}


def _condition(c: dict) -> DropCondition:
    if c.get("op") not in _VALID_OPS:
        raise ValueError(
            f"invalid rule op {c.get('op')!r} for column {c.get('column')!r}; "
            f"valid: {sorted(_VALID_OPS)}"
        )
    return DropCondition(c["column"], c["op"], c.get("value"))


def _conditions(raw) -> tuple:
    return tuple(_condition(c) for c in raw)


def _parse_node(node):
    """One rule node: a {"and"/"or": [...]} tree or a leaf condition dict."""
    if isinstance(node, dict) and ("and" in node or "or" in node):
        if "and" in node and "or" in node:
            raise ValueError(
                "a rule tree node must have exactly one of 'and'/'or', "
                f"got both: {node}"
            )
        op = "and" if "and" in node else "or"
        children = node[op]
        if not children:
            raise ValueError(f"empty {op!r} rule node: {node}")
        return RuleTree(op, tuple(_parse_node(c) for c in children))
    if isinstance(node, dict):
        return _condition(node)
    raise ValueError(f"rule node must be a dict, got {type(node).__name__}")


def _rules(raw) -> tuple:
    out = []
    for rule in raw:
        if isinstance(rule, dict):  # nested AND/OR tree (or a single leaf)
            out.append(_parse_node(rule))
        else:  # classic AND-list
            out.append(_conditions(rule))
    return tuple(out)


def pipeline_config_from_dict(d: Dict[str, Any]) -> PipelineConfig:
    norm = NormalizeConfig(
        tenant_id=d.get("tenant_id", "default-tenant"),
        tenant_column=d.get("tenant_column"),
        drop_rules=_rules(d.get("drop_rules", [])),
        bypass_rules=_rules(d.get("bypass_rules", [])),
    )
    space_rules = tuple(
        SpaceRule(r["space_id"], _conditions(r["conditions"]))
        for r in d.get("space_rules", [])
    )
    kwargs: Dict[str, Any] = {}
    for key in (
        "max_turns_per_conv",
        "num_partitions",
        "read_num_blocks",
        "metrics_window",
        "enable_client_info",
        "peer_correlation",
        "drop_root_exits",
        "latency_sample_pct",
        "service_registry",
    ):
        if key in d:
            kwargs[key] = d[key]
    if "session_gap_sec" in d and d["session_gap_sec"] is not None:
        kwargs["session_gap_us"] = int(d["session_gap_sec"] * 1_000_000)
    if d.get("rate_limit") is not None:
        kwargs["rate_limit"] = RateLimitConfig(**d["rate_limit"])
    if "root_exit_exclusions" in d:
        kwargs["root_exit_exclusions"] = _rules(d["root_exit_exclusions"])
    return PipelineConfig(normalize=norm, space_rules=space_rules, **kwargs)


def load_pipeline_config(path: str) -> PipelineConfig:
    with open(path) as f:
        return pipeline_config_from_dict(json.load(f))
