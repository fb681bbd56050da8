"""Metadata-hygienic Parquet reads.

Driver-generated Parquet carries pandas/ARROW:schema metadata; a pyarrow
schema WITH metadata is unhashable (``hash(schema)`` raises on the metadata
dict), which makes Ray Data's block-schema deduplication log a
"Failed to hash the schemas" warning inside the read operator — before any
``map_batches`` could strip it.  Passing an explicit metadata-free ``schema=``
to ``read_parquet`` makes every block schema clean at the source.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data
from ray.data import Dataset


def _any_parquet_file(path: str) -> Optional[str]:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "*.parquet")))
    return hits[0] if hits else None


def clean_schema(
    path: str, columns: Optional[Sequence[str]] = None
) -> Optional[pa.Schema]:
    """The file's arrow schema, metadata stripped (and column-pruned)."""
    f = _any_parquet_file(path)
    if f is None:
        return None
    schema = pq.ParquetFile(f).schema_arrow.remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return schema


def read_parquet_clean(
    path: str, *, columns: Optional[Sequence[str]] = None, **kwargs
) -> Dataset:
    """``ray.data.read_parquet`` with a metadata-free schema so block-schema
    hashing (and therefore shuffle-side schema dedup) works silently."""
    schema = clean_schema(path, columns)
    if schema is not None:
        kwargs.setdefault("schema", schema)
    if columns is not None:
        kwargs["columns"] = list(columns)
    return ray.data.read_parquet(path, **kwargs)
