"""Enricher registry (topo sort) + enricher semantics on a crafted conversation.

Mirrors the reference's per-enricher unit-test strategy (SURVEY.md §5):
one assertion block per enricher over a small in-memory trace."""

import hashlib

import pyarrow as pa
import pytest

from hypertrace_ingester_ray.enrichers import (
    Enricher,
    EnrichmentRegistry,
    build_default_registry,
)
from hypertrace_ingester_ray.stages.normalize import normalize_batch


def _mk(name, deps=()):
    class E(Enricher):
        pass

    E.name = name
    E.depends_on = deps
    E.enrich = lambda self, t, ctx: t
    return E()


def test_topo_sort_dependency_order():
    reg = EnrichmentRegistry([_mk("c", ("b",)), _mk("b", ("a",)), _mk("a")])
    assert [e.name for e in reg.ordered] == ["a", "b", "c"]


def test_topo_sort_cycle_raises():
    with pytest.raises(ValueError, match="cycle"):
        EnrichmentRegistry([_mk("a", ("b",)), _mk("b", ("a",))])


def test_topo_sort_unknown_dep_raises():
    with pytest.raises(ValueError, match="unknown"):
        EnrichmentRegistry([_mk("a", ("zzz",))])


@pytest.fixture(scope="module")
def enriched():
    # one conversation: user → assistant(tool call) → tool(error) → user → assistant
    raw = pa.table(
        {
            "conv_id": pa.array(["c1"] * 5 + ["c2"], pa.string()),
            "turn_idx": pa.array([0, 1, 2, 3, 4, 0], pa.int32()),
            "role": pa.array(
                ["user", "assistant", "tool", "user", "assistant", "tool"],
                pa.string(),
            ),
            "text": pa.array(
                [
                    "GET /api/v1/view/1 HTTP/1.1 status=200 dur_ms=5 bytes=1",
                    "POST /api/v1/purchase/2 HTTP/1.1 status=200 dur_ms=6 bytes=2",
                    "GET /api/v1/error/3 HTTP/1.1 status=500 dur_ms=7 bytes=3",
                    "GET /api/v1/click/4 HTTP/1.1 status=200 dur_ms=8 bytes=4",
                    "POST /api/v1/signup/5 HTTP/1.1 status=404 dur_ms=9 bytes=5",
                    "GET /api/v1/error/6 HTTP/1.1 status=503 dur_ms=1 bytes=6",
                ],
                pa.string(),
            ),
            "tool": pa.array([None, "db", "db", None, None, "http"], pa.string()),
            "ts": pa.array([10, 20, 30, 40, 50, 60], pa.timestamp("us")),
        }
    )
    norm = normalize_batch(raw).append_column(
        "session_id", pa.array([0] * 6, pa.int32())
    )
    return build_default_registry().apply(norm)


def test_span_kind_and_protocol(enriched):
    assert enriched["span_kind"].to_pylist() == [
        "ENTRY", "INTERNAL", "EXIT", "ENTRY", "INTERNAL", "EXIT",
    ]
    assert enriched["protocol"].to_pylist() == [
        "HTTP", "SQL", "SQL", "HTTP", "HTTP", "HTTP",
    ]


def test_api_status(enriched):
    assert enriched["api_status"].to_pylist() == [
        "SUCCESS", "SUCCESS", "FAIL", "SUCCESS", "FAIL", "FAIL",
    ]
    assert enriched["status_message"].to_pylist() == [
        "OK", "OK", "Internal Server Error", "OK", "Not Found",
        "Service Unavailable",
    ]


def test_boundary_and_episodes(enriched):
    assert enriched["is_boundary"].to_pylist() == [
        True, True, True, True, True, True,
    ]
    assert enriched["episode_id"].to_pylist() == [0, 0, 0, 1, 1, 0]
    assert enriched["episode_head"].to_pylist() == [
        True, False, False, True, False, True,
    ]


def test_entity_ids_deterministic(enriched):
    svc = enriched["service_id"].to_pylist()
    assert svc[0] == "svc_" + hashlib.md5(b"user").hexdigest()[:8]
    assert svc[1] == "svc_" + hashlib.md5(b"db").hexdigest()[:8]
    api = enriched["api_name"].to_pylist()
    assert api[0] == "user:view"
    be = enriched["backend_id"].to_pylist()
    assert be[0] is None
    assert be[1] == "be_" + hashlib.md5(b"db:SQL").hexdigest()[:8]


def test_exit_calls_per_episode(enriched):
    # c1 episode 0 has 2 tool-bearing turns, episode 1 has 0; c2 has 1
    assert enriched["exit_call_count"].to_pylist() == [2, 2, 2, 0, 0, 1]


def test_transaction_name(enriched):
    assert enriched["transaction_name"].to_pylist() == [
        "view", "view", "view", "view", "view", None,
    ]


def test_conv_has_error(enriched):
    assert enriched["conv_has_error"].to_pylist() == [True] * 6


def test_service_registry_override():
    reg = build_default_registry(service_registry={"db": "svc_custom"})
    raw = pa.table(
        {
            "conv_id": pa.array(["c"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["tool"], pa.string()),
            "text": pa.array(["GET /api/v1/error/1 HTTP/1.1 status=500 dur_ms=1 bytes=1"], pa.string()),
            "tool": pa.array(["db"], pa.string()),
            "ts": pa.array([1], pa.timestamp("us")),
        }
    )
    norm = normalize_batch(raw).append_column("session_id", pa.array([0], pa.int32()))
    out = reg.apply(norm)
    assert out["service_id"].to_pylist() == ["svc_custom"]
