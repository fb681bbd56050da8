"""Transcript source tests: derivation vs DuckDB, synthetic determinism."""

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

from hypertrace_ingester_ray.sources import transcripts as src


def test_derivation_matches_duckdb(ray_session, sf_dir):
    ds = src.transcripts_from_events(sf_dir, num_partitions=8)
    mine = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    oracle = con.sql(
        f"WITH {src.TRANSCRIPTS_CTE} SELECT * FROM transcripts ORDER BY conv_id, turn_idx"
    ).df()
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)


def test_synth_deterministic():
    a = src.synthesize_batch(0, 50, seed=7)
    b = src.synthesize_batch(0, 50, seed=7)
    assert a.equals(b)
    # a different shard start yields a disjoint conversation range
    part = src.synthesize_batch(50, 25, seed=7)
    assert not set(part["conv_id"].to_pylist()) & set(a["conv_id"].to_pylist())


def test_synth_schema_and_grok_compat(tmp_path, ray_session):
    from hypertrace_ingester_ray.stages.normalize import normalize_batch

    t = src.synthesize_batch(0, 20, seed=3)
    assert t.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    norm = normalize_batch(t)
    # every synthetic text line must grok-parse
    assert norm["status_code"].null_count == 0
    assert norm["dur_ms"].null_count == 0


def test_synth_hot_conversations():
    t = src.synthesize_batch(0, 10, seed=3, hot_conv_every=5, hot_turns=500)
    counts = t.group_by("conv_id").aggregate([([], "count_all")]).to_pandas()
    hot = counts[counts["count_all"] >= 500]
    assert len(hot) == 2  # conv_0 and conv_5


def test_write_synthetic_resumable(tmp_path):
    out = str(tmp_path / "corpus")
    src.write_synthetic_transcripts(out, n_convs=100, convs_per_file=40, seed=5)
    import glob, os

    files = sorted(glob.glob(os.path.join(out, "*.parquet")))
    assert len(files) == 3
    before = [os.path.getmtime(f) for f in files]
    src.write_synthetic_transcripts(out, n_convs=100, convs_per_file=40, seed=5)
    after = [os.path.getmtime(f) for f in files]
    assert before == after  # existing shards untouched
