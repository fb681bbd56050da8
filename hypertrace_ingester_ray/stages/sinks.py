"""Generic resumable partitioned parquet sink.

Generalizes the flagship's sink discipline (pipelines/ingest.py §sinks —
atomic rename, streamed CRC32 checksums, per-partition manifests, resume
guard on partition count; reference analog: the keyed sink + offset-commit
semantics of the ingest topology, SURVEY.md §2 S2) into a one-call operator
any corpus pipeline can use:

    summary = write_partitioned(docs_clean, "/out/clean", key="doc_id")

- output is ONE parquet file per hash partition of complete key-groups —
  never one giant file, so a failed 100 TB run resumes by skipping every
  partition whose manifest validates (file present + CRC match);
- writes happen INSIDE the dataset tasks (distributed, streaming), the
  driver only collects the per-partition stats rows;
- re-running with a different ``num_partitions`` into the same directory
  raises instead of silently interleaving two layouts.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from ray.data import Dataset

from ..state import lineage
from .grouping import DEFAULT_NUM_PARTITIONS, group_apply

_STATS_SCHEMA = pa.schema(
    [
        ("part_id", pa.int64()),
        ("rows", pa.int64()),
        ("resumed", pa.bool_()),
    ]
)


def write_partitioned(
    ds: Dataset,
    out_dir: str,
    *,
    key,
    view: str = "data",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> dict:
    """Write ``ds`` as ``num_partitions`` keyed parquet files with CRC
    manifests; skip partitions already committed by a previous run.

    Returns ``{"rows", "num_partitions", "resumed_partitions",
    "view_counts"}``.  The shuffle still runs on resume (manifests gate the
    WRITE, not the exchange) — resuming saves the sink + downstream cost,
    which is the expensive part for write-heavy jobs."""
    run_path = os.path.join(out_dir, "_run_manifest.json")
    if os.path.exists(run_path):
        with open(run_path) as f:
            prev = json.load(f)
        if prev.get("num_partitions") != num_partitions:
            raise ValueError(
                f"resume with num_partitions={num_partitions} but {out_dir} "
                f"was written with {prev.get('num_partitions')}"
            )
    os.makedirs(out_dir, exist_ok=True)
    with open(run_path + ".tmp", "w") as f:
        json.dump({"num_partitions": num_partitions, "view": view}, f)
    os.rename(run_path + ".tmp", run_path)

    def _write(part: pa.Table, part_id: int) -> pa.Table:
        if part.num_rows == 0:
            return _STATS_SCHEMA.empty_table()
        m = lineage.load_manifest(out_dir, part_id)
        if m is not None:
            return pa.table(
                {
                    "part_id": [part_id],
                    "rows": [int(m["view_counts"].get(view, 0))],
                    "resumed": [True],
                },
                schema=_STATS_SCHEMA,
            )
        rows, crc = lineage.write_view_part(out_dir, view, part_id, part)
        lineage.commit_manifest(
            out_dir,
            part_id,
            rows_in=part.num_rows,
            rows_deduped=0,
            rows_capped=0,
            view_counts={view: rows},
            view_checksums={view: crc},
        )
        return pa.table(
            {"part_id": [part_id], "rows": [rows], "resumed": [False]},
            schema=_STATS_SCHEMA,
        )

    stats = group_apply(
        ds, key, _write, pass_part_id=True, num_partitions=num_partitions
    ).to_pandas()
    summary = {
        "rows": int(stats["rows"].sum()) if len(stats) else 0,
        "num_partitions": int(len(stats)),
        "resumed_partitions": int(stats["resumed"].sum()) if len(stats) else 0,
        "view_counts": {view: int(stats["rows"].sum()) if len(stats) else 0},
    }
    lineage.write_run_manifest(out_dir, {**summary, "view": view})
    return summary
