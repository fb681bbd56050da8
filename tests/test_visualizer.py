"""Trace-visualizer analog (TraceUI.java): tree edges + nested D3 JSON."""

import json
import os

import numpy as np
import pyarrow as pa

from hypertrace_ingester_ray.functions.visualizer import (
    _parent_rows,
    conversation_tree_json,
    export_conversation_json,
    tree_edges,
)


def _conv(conv_id, rows):
    """rows: list of (turn_idx, role, tool)"""
    return pa.table(
        {
            "conv_id": pa.array([conv_id] * len(rows), pa.string()),
            "turn_idx": pa.array([r[0] for r in rows], pa.int32()),
            "role": pa.array([r[1] for r in rows], pa.string()),
            "tool": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def test_parent_rows_tool_fanout_and_chain():
    # turns: user, assistant, tool, tool, assistant
    # tools fan out from the assistant at row 1; row 4 chains from row 1
    t = _conv("c", [(0, "user", None), (1, "assistant", None),
                    (2, "tool", "search"), (3, "tool", "calc"),
                    (4, "assistant", None)])
    codes = np.zeros(5, dtype=np.int64)
    is_tool = t["tool"].is_valid().to_numpy(zero_copy_only=False)
    p = _parent_rows(codes, is_tool)
    assert p.tolist() == [-1, 0, 1, 1, 1]


def test_parent_rows_reset_across_conversations():
    t = pa.concat_tables(
        [_conv("a", [(0, "user", None), (1, "tool", "x")]),
         _conv("b", [(0, "tool", "y"), (1, "user", None)])]
    )
    codes = np.array([0, 0, 1, 1], dtype=np.int64)
    is_tool = t["tool"].is_valid().to_numpy(zero_copy_only=False)
    p = _parent_rows(codes, is_tool)
    # b's first turn is a tool with NO preceding non-tool in b: it is a
    # root (the missing-parent-makes-root rule), NOT a child of a's rows
    assert p.tolist() == [-1, 0, -1, -1]


def test_tree_edges_table():
    t = pa.concat_tables(
        [_conv("a", [(0, "user", None), (1, "tool", "x"), (2, "assistant", None)]),
         _conv("b", [(0, "tool", "y"), (1, "user", None)])]
    )
    out = tree_edges(t)
    assert out.column_names == ["conv_id", "turn_idx", "parent_turn_idx"]
    got = {
        (r["conv_id"], r["turn_idx"]): r["parent_turn_idx"]
        for r in out.to_pylist()
    }
    assert got == {
        ("a", 0): None, ("a", 1): 0, ("a", 2): 0,
        ("b", 0): None, ("b", 1): None,
    }


def test_tree_edges_empty():
    out = tree_edges(_conv("a", []).slice(0, 0))
    assert out.num_rows == 0
    assert out.column_names == ["conv_id", "turn_idx", "parent_turn_idx"]


def test_conversation_tree_json_structure():
    t = _conv("c", [(0, "user", None), (1, "assistant", None),
                    (2, "tool", "search"), (3, "assistant", None)])
    roots = conversation_tree_json(t)
    assert len(roots) == 1
    root = roots[0]
    assert root["id"] == "c:0" and root["parent"] == "null"
    assert root["name"] == "user"
    # attributes flatten every non-structural non-null column (TraceUI
    # merges raw + enriched attribute maps)
    assert root["attributes"]["eventId"] == "c:0"
    assert root["attributes"]["role"] == "user"
    assert "tool" not in root["attributes"]  # null values omitted
    (a1,) = root["children"]
    assert a1["id"] == "c:1" and a1["parent"] == "c:0"
    ids = sorted(ch["id"] for ch in a1["children"])
    assert ids == ["c:2", "c:3"]
    assert a1["children"][0]["attributes"]["tool"] in ("search",)


def test_conversation_tree_json_multiple_roots():
    # a conversation that OPENS with tool turns: each is its own root
    t = _conv("c", [(0, "tool", "x"), (1, "tool", "y"), (2, "user", None)])
    roots = conversation_tree_json(t)
    assert sorted(r["id"] for r in roots) == ["c:0", "c:1", "c:2"]


def test_export_conversation_json(tmp_path):
    t = pa.concat_tables(
        [_conv("convA", [(0, "user", None), (1, "tool", "x")]),
         _conv("convB", [(0, "user", None)])]
    )
    paths = export_conversation_json(t, str(tmp_path))
    assert sorted(os.path.basename(p) for p in paths) == [
        "convA.json", "convB.json",
    ]
    # one root JSON object per line (TraceUI.writeToFile format)
    with open(os.path.join(tmp_path, "convA.json")) as f:
        lines = [json.loads(line) for line in f if line.strip()]
    assert len(lines) == 1
    assert lines[0]["id"] == "convA:0"
    assert lines[0]["children"][0]["id"] == "convA:1"
