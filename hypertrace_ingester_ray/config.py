"""Config loading — the typesafe-config / config-service analog.

The reference drives drop filters, exclude rules, space rules, service-name
overrides and rate limits from reloadable config
(/root/reference/span-normalizer/.../jaeger/ExcludeSpanRulesCache.java,
SpaceRulesCachingClient.java).  Here the same rule shapes load from a JSON
file once per run; workers receive them via the (broadcast) PipelineConfig.

JSON shape:

{
  "tenant_id": "acme",
  "drop_rules": [[{"column": "role", "op": "EQ", "value": "system"}]],
  "bypass_rules": [],
  "space_rules": [{"space_id": "errors", "conditions": [
      {"column": "is_error", "op": "EQ", "value": true}]}],
  "max_turns_per_conv": 50000,
  "session_gap_sec": 1800,
  "num_partitions": 128,
  "enable_client_info": true,
  "peer_correlation": false,
  "latency_sample_pct": 10
}
"""

from __future__ import annotations

import json
from typing import Any, Dict

from .enrichers.extended import SpaceRule
from .pipelines.ingest import PipelineConfig
from .stages.normalize import DropCondition, NormalizeConfig


_VALID_OPS = {"EQ", "NEQ", "CONTAINS", "EXISTS", "NOT_EXISTS"}


def _conditions(raw) -> tuple:
    for c in raw:
        if c["op"] not in _VALID_OPS:
            raise ValueError(
                f"invalid rule op {c['op']!r} for column {c.get('column')!r}; "
                f"valid: {sorted(_VALID_OPS)}"
            )
    return tuple(
        DropCondition(c["column"], c["op"], c.get("value")) for c in raw
    )


def _rules(raw) -> tuple:
    return tuple(_conditions(rule) for rule in raw)


def pipeline_config_from_dict(d: Dict[str, Any]) -> PipelineConfig:
    norm = NormalizeConfig(
        tenant_id=d.get("tenant_id", "default-tenant"),
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
    if "root_exit_exclusions" in d:
        kwargs["root_exit_exclusions"] = _rules(d["root_exit_exclusions"])
    return PipelineConfig(normalize=norm, space_rules=space_rules, **kwargs)


def load_pipeline_config(path: str) -> PipelineConfig:
    with open(path) as f:
        return pipeline_config_from_dict(json.load(f))
