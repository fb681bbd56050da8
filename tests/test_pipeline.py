"""End-to-end pipeline tests: golden per-sink counts, per-turn text equality
under stable (conv_id, turn_idx) order, resume with no dup/missing rows."""

import glob
import json
import os
import shutil

import duckdb
import pandas as pd
import pytest

from hypertrace_ingester_ray.pipelines.ingest import (
    PipelineConfig,
    run_pipeline,
    view_dataset,
)
from hypertrace_ingester_ray.sources.transcripts import (
    TRANSCRIPTS_CTE,
    transcripts_from_events,
)


def test_per_sink_counts(pipeline_out):
    _, summary = pipeline_out
    assert summary["rows_in"] == 1000
    assert summary["view_counts"] == {
        "per_turn": 1000,
        "per_role": 651,
        "per_conversation": 15,
        "call_edges": 777,  # 636 api_edge + 141 root/backend/non-root rows
        "per_tool": 403,
        "errors": 295,
    }


def test_per_turn_text_equality(pipeline_out, sf_dir):
    out, _ = pipeline_out
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    oracle = con.sql(
        f"WITH {TRANSCRIPTS_CTE} SELECT conv_id, turn_idx, text FROM transcripts"
        " ORDER BY conv_id, turn_idx"
    ).df()
    mine = (
        view_dataset(out, "per_turn")
        .to_pandas()[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)


def test_sink_layout_and_manifests(pipeline_out):
    out, summary = pipeline_out
    for view in summary["view_counts"]:
        files = glob.glob(os.path.join(out, view, "*.parquet"))
        assert len(files) == summary["num_partitions"]
    manifests = glob.glob(os.path.join(out, "_manifests", "*.json"))
    assert len(manifests) == summary["num_partitions"]
    with open(os.path.join(out, "_run_manifest.json")) as f:
        rm = json.load(f)
    assert rm["view_counts"] == summary["view_counts"]


def test_rerun_resumes_all_partitions(pipeline_out, sf_dir):
    out, summary = pipeline_out
    s2 = run_pipeline(
        transcripts_from_events(sf_dir),
        out,
        PipelineConfig(num_partitions=8, concurrency=2),
    )
    assert s2["resumed_partitions"] == s2["num_partitions"]
    assert s2["view_counts"] == summary["view_counts"]


def test_kill_resume_no_dup_no_missing(tmp_path, sf_dir):
    """Simulate a mid-run kill: complete run, then invalidate half the
    partitions (as if they never committed) and resume — routed rows must be
    identical to a clean run."""
    out = str(tmp_path / "killrun")
    cfg = PipelineConfig(num_partitions=8, concurrency=2)
    s1 = run_pipeline(transcripts_from_events(sf_dir), out, cfg)

    # destroy the commit record AND data of partitions 0..3 (simulated crash
    # before their manifests were written); also leave a stray tmp file
    for pid in range(4):
        os.remove(os.path.join(out, "_manifests", f"part-{pid:05d}.json"))
        os.remove(os.path.join(out, "per_turn", f"part-{pid:05d}.parquet"))
    open(os.path.join(out, "per_turn", "part-00000.parquet.tmp"), "w").close()
    os.remove(os.path.join(out, "_run_manifest.json"))
    shutil.rmtree(os.path.join(out, "metrics"))

    s2 = run_pipeline(transcripts_from_events(sf_dir), out, cfg)
    assert s2["resumed_partitions"] == 4
    assert s2["view_counts"] == s1["view_counts"]
    pt = view_dataset(out, "per_turn").to_pandas()
    assert len(pt) == s1["view_counts"]["per_turn"]
    assert not pt.duplicated(["conv_id", "turn_idx"]).any()


def test_metrics_totals(pipeline_out):
    out, summary = pipeline_out
    m = view_dataset(out, "metrics").to_pandas()
    assert m["num_calls"].sum() == summary["view_counts"]["per_turn"]
    assert set(m.columns) == {
        "window_ts", "tenant_id", "service_name", "api_status", "num_calls",
    }
