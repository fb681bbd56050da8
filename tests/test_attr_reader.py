"""trace-reader analog: ValueCoercer coercion cases (ported from
/root/reference/.../trace-reader ValueCoercerTest.java) + DefaultValueResolver
first-match / expression semantics over Arrow batches."""

import numpy as np
import pyarrow as pa
import pytest

from hypertrace_ingester_ray.functions.attr_reader import (
    AttributeProjector,
    coerce_scalar,
    coerce_string_array,
    project_attributes,
)


# --- ValueCoercerTest.canCoerceFromString ---------------------------------


def test_coerce_from_string():
    assert coerce_scalar("some string", "string") == "some string"
    assert coerce_scalar("true", "bool") is True
    assert coerce_scalar("FALSE", "bool") is False
    assert coerce_scalar("dummy", "bool") is None
    assert coerce_scalar("42", "int64") == 42
    assert coerce_scalar("dummy", "int64") is None
    assert coerce_scalar("42", "double") == 42.0
    assert coerce_scalar("dummy", "double") is None
    assert coerce_scalar("1604339469114", "timestamp") == 1604339469114
    assert coerce_scalar("2020-11-02T17:51:09.114Z", "timestamp") == 1604339469114
    assert coerce_scalar("???", "timestamp") is None
    # unsupported kinds -> Optional.empty analog
    assert coerce_scalar("[]", "string_array") is None
    assert coerce_scalar("{}", "string_map") is None


# --- ValueCoercerTest.canCoerceFromDouble ----------------------------------


def test_coerce_from_double():
    assert coerce_scalar(42.3, "string") == "42.3"
    assert coerce_scalar(42.3, "bool") is None
    assert coerce_scalar(42.3, "int64") == 42
    assert coerce_scalar(42.0, "int64") == 42
    assert coerce_scalar(42.3, "timestamp") == 42
    assert coerce_scalar(1604339469114.0, "timestamp") == 1604339469114
    assert coerce_scalar(42.3, "double") == 42.3
    assert coerce_scalar(42.3, "string_array") is None
    assert coerce_scalar(42.3, "string_map") is None


def test_coerce_from_long_and_edge_values():
    assert coerce_scalar(42, "double") == 42.0
    assert coerce_scalar(42, "string") == "42"
    assert coerce_scalar(42, "int64") == 42
    assert coerce_scalar(42, "timestamp") == 42
    assert coerce_scalar(42, "bool") is None  # no long->bool overload
    # Long.valueOf range guard
    assert coerce_scalar(str(2**63 - 1), "int64") == 2**63 - 1
    assert coerce_scalar(str(2**63), "int64") is None
    # Number.longValue() on non-finite doubles
    assert coerce_scalar(float("nan"), "int64") == 0
    assert coerce_scalar(float("inf"), "int64") == 2**63 - 1
    assert coerce_scalar(float("-inf"), "int64") == -(2**63)
    assert coerce_scalar(None, "int64") is None


def test_coerce_string_array_vectorized_matches_scalar():
    vals = ["42", "dummy", None, "-7", "9" * 25, "+3"]
    out = coerce_string_array(pa.array(vals, pa.string()), "int64")
    assert out.to_pylist() == [42, None, None, -7, None, 3]
    outb = coerce_string_array(
        pa.array(["true", "False", "x", None]), "bool"
    )
    assert outb.to_pylist() == [True, False, None, None]


# --- DefaultValueResolver dispatch over batches -----------------------------


def _batch():
    return pa.table(
        {
            "ts": pa.array([1_700_000_000_000_000, None], pa.timestamp("us")),
            "dur": pa.array([12.9, 3.2], pa.float64()),
            "tags": pa.array(
                [
                    [("page", "5"), ("q", "signup")],
                    [("q", "view")],
                ],
                pa.map_(pa.string(), pa.string()),
            ),
            "enriched": pa.array(
                [[("page", "99")], []], pa.map_(pa.string(), pa.string())
            ),
        }
    )


def test_source_path_chain_enriched_first():
    proj = AttributeProjector(
        [
            {
                "name": "page",
                "kind": "int64",
                "definition": {"source_path": "page"},
            }
        ],
        tags_cols=("enriched", "tags"),
    )
    out = proj(_batch())
    assert out["page"].to_pylist() == [99, None]  # enriched wins; missing→null


def test_first_value_present_and_literal():
    proj = AttributeProjector(
        [
            {
                "name": "page",
                "kind": "int64",
                "definition": {
                    "first_value_present": [
                        {"source_path": "page"},
                        {"literal": -1},
                    ]
                },
            }
        ],
        tags_cols=("tags",),
    )
    assert proj(_batch())["page"].to_pylist() == [5, -1]


def test_source_field_epoch_millis():
    proj = AttributeProjector(
        [
            {
                "name": "start_ms",
                "kind": "timestamp",
                "definition": {"source_field": "start_time"},
            }
        ],
        field_cols={"start_time": "ts"},
    )
    assert proj(_batch())["start_ms"].to_pylist() == [1_700_000_000_000, None]


def test_source_column_metric_double():
    proj = AttributeProjector(
        [
            {
                "name": "dur_l",
                "kind": "int64",
                "definition": {"source_column": "dur"},
            },
            {
                "name": "dur_s",
                "kind": "string",
                "definition": {"source_column": "dur"},
            },
        ]
    )
    out = proj(_batch())
    assert out["dur_l"].to_pylist() == [12, 3]
    assert out["dur_s"].to_pylist() == ["12.9", "3.2"]


def test_expression_concatenate_all_or_nothing():
    proj = AttributeProjector(
        [
            {
                "name": "label",
                "kind": "string",
                "definition": {
                    "expression": {
                        "operator": "concatenate",
                        "args": [
                            {"literal": "page-"},
                            {"source_path": "page"},
                        ],
                    }
                },
            }
        ],
        tags_cols=("tags",),
    )
    # row 2 has no 'page' tag: any unresolved argument voids the expression
    assert proj(_batch())["label"].to_pylist() == ["page-5", None]


def test_config_errors_raise_at_construction():
    with pytest.raises(ValueError, match="unsupported source field"):
        AttributeProjector(
            [
                {
                    "name": "x",
                    "kind": "int64",
                    "definition": {"source_field": "nope"},
                }
            ]
        )
    with pytest.raises(ValueError, match="unregistered projection operator"):
        AttributeProjector(
            [
                {
                    "name": "x",
                    "kind": "string",
                    "definition": {
                        "expression": {"operator": "bogus", "args": []}
                    },
                }
            ]
        )
    with pytest.raises(ValueError, match="exactly one"):
        AttributeProjector(
            [{"name": "x", "kind": "string", "definition": {}}]
        )


def test_project_attributes_dataset(ray_session):
    import ray

    ds = project_attributes(
        ray.data.from_arrow(_batch()),
        [
            {
                "name": "page",
                "kind": "int64",
                "definition": {
                    "first_value_present": [
                        {"source_path": "page"},
                        {"literal": 0},
                    ]
                },
            }
        ],
        tags_cols=("tags",),
    )
    assert ds.to_pandas()["page"].tolist() == [5, 0]
