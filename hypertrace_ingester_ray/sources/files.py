"""CSV / JSONL transcript sources.

The reference ingests from Kafka topics (Avro-framed); this engine's batch
analog is files.  Parquet is the primary format (`sources/parquet.py`);
these readers add the two interchange formats a migration actually meets —
CSV dumps and JSON-lines exports — and normalize both to the SAME canonical
transcript schema as ``read_transcripts``:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string (empty → null), ts:timestamp[us]

The file contract carries ``ts_us`` as int64 epoch microseconds (the only
timestamp form CSV/JSON round-trip losslessly); ``tool`` may be empty/null.
Both readers stream through Ray Data's native file datasources (parallel
per-file tasks, no driver materialization); normalization is one vectorized
``map_batches`` cast pass.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

TRANSCRIPT_FILE_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts_us"]


def _normalize_batch(batch: pa.Table) -> pa.Table:
    missing = [c for c in TRANSCRIPT_FILE_COLUMNS if c not in batch.column_names]
    if missing:
        raise ValueError(
            f"transcript file missing columns {missing} "
            f"(has {batch.column_names})"
        )
    tool = batch["tool"]
    if pa.types.is_string(tool.type) or pa.types.is_large_string(tool.type):
        # CSV has no null/empty distinction for strings: empty → null
        tool = pc.if_else(
            pc.equal(pc.fill_null(tool, ""), ""), pa.nulls(len(tool), pa.string()), tool
        )
    else:
        tool = tool.cast(pa.string())
    return pa.table(
        {
            "conv_id": batch["conv_id"].cast(pa.string()),
            "turn_idx": batch["turn_idx"].cast(pa.int32()),
            "role": batch["role"].cast(pa.string()),
            "text": batch["text"].cast(pa.string()),
            "tool": tool,
            "ts": batch["ts_us"].cast(pa.int64()).cast(pa.timestamp("us")),
        }
    )


def read_transcripts_csv(path: str, **read_kwargs) -> Dataset:
    """Read a transcript corpus from CSV file(s) (file or directory)."""
    import ray.data
    from pyarrow import csv as pacsv

    convert_options = pacsv.ConvertOptions(
        column_types={
            "conv_id": pa.string(),
            "turn_idx": pa.int32(),
            "role": pa.string(),
            "text": pa.string(),
            "tool": pa.string(),
            "ts_us": pa.int64(),
        }
    )
    ds = ray.data.read_csv(path, convert_options=convert_options, **read_kwargs)
    return ds.map_batches(_normalize_batch, batch_format="pyarrow")


def read_transcripts_jsonl(path: str, **read_kwargs) -> Dataset:
    """Read a transcript corpus from JSON-lines file(s) (file or directory)."""
    import ray.data

    ds = ray.data.read_json(path, **read_kwargs)
    return ds.map_batches(_normalize_batch, batch_format="pyarrow")
