"""Document-corpus cleaning pipeline — the training-data composition demo.

Chains the text-analysis and dedup operators into the canonical
"clean a web-scale corpus" flow:

  read(documents)
    → quality signals (map_batches, vectorized)        stages/text_analysis
    → quality filter (min tokens / stopword evidence)
    → exact dedup (hash-partition keep-first)          stages/dedup
    → cleaned corpus + per-reason drop counts

Each stage streams; the only shuffle is the dedup's hash partition.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from ..stages import dedup, text_analysis


def clean_documents(
    sf_dir: str,
    *,
    min_tokens: int = 10,
    num_partitions: int = 16,
) -> Dataset:
    """Quality-filter then exact-dedup the documents table.

    Returns one row per surviving document: (doc_id, text, n_tokens,
    n_copies) where doc_id is the smallest id among exact duplicates.
    """
    from ..sources.parquet import read_parquet_clean

    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def with_quality(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(batch["text"], " ")
        n_tokens = pc.cast(pc.list_value_length(tokens), pa.int64())
        batch = batch.append_column("n_tokens", n_tokens)
        return batch.filter(pc.greater_equal(batch["n_tokens"], min_tokens))

    filtered = ds.map_batches(with_quality, batch_format="pyarrow")
    return dedup.exact_dedup(filtered, num_partitions=num_partitions).select_columns(
        ["doc_id", "text", "n_tokens", "n_copies"]
    )
