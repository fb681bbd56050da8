"""CSV / JSONL transcript sources round-trip to the canonical schema."""

import json
import os

import pyarrow as pa
import pytest

import ray.data

from hypertrace_ingester_ray.sources.files import (
    read_transcripts_csv,
    read_transcripts_jsonl,
)

ROWS = [
    {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hello there",
     "tool": "", "ts_us": 1_700_000_000_000_000},
    {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "hi!",
     "tool": "search", "ts_us": 1_700_000_001_000_000},
    {"conv_id": "c2", "turn_idx": 0, "role": "user", "text": "a,b \"quoted\"",
     "tool": "", "ts_us": 1_700_000_002_000_000},
]

EXPECT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _check(ds):
    t = pa.Table.from_pandas(
        ds.to_pandas(), preserve_index=False
    ).cast(EXPECT_SCHEMA)
    df = t.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(df.conv_id) == ["c1", "c1", "c2"]
    assert df.tool.tolist() == [None, "search", None]  # empty -> null
    assert df.text.tolist() == ["hello there", "hi!", 'a,b "quoted"']
    assert int(df.ts.astype("int64").iloc[0]) == ROWS[0]["ts_us"]


def test_csv_source(ray_session, tmp_path):
    import csv

    p = tmp_path / "t.csv"
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(ROWS[0]))
        w.writeheader()
        w.writerows(ROWS)
    ds = read_transcripts_csv(str(p))
    assert [f.name for f in ds.schema().base_schema] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    _check(ds)


def test_jsonl_source(ray_session, tmp_path):
    p = tmp_path / "t.jsonl"
    with open(p, "w") as f:
        for r in ROWS:
            f.write(json.dumps({**r, "tool": r["tool"] or None}) + "\n")
    _check(read_transcripts_jsonl(str(p)))


def test_missing_column_raises(ray_session, tmp_path):
    p = tmp_path / "bad.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"conv_id": "c", "text": "x"}) + "\n")
    with pytest.raises(Exception, match="missing columns"):
        read_transcripts_jsonl(str(p)).materialize()
