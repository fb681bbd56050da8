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


def corpus_prep(
    sf_dir: str,
    *,
    min_tokens: int = 10,
    max_overlap_x1000: int = 500,
    num_partitions: int = 16,
) -> Dataset:
    """The full training-corpus preparation flagship, chaining the corpus
    operators end-to-end the way a 100 TB pretraining pipeline would:

      quality filter → exact dedup → benchmark decontamination (drop docs
      whose 3-gram overlap with the eval set ≥ ``max_overlap_x1000``/1000)
      → deterministic train/val/test split

    One hash shuffle total (the dedup); decontamination broadcasts the eval
    shingle set; the split is a pure per-row hash.  Every step is
    deterministic and SQL-mirrorable, so the WHOLE chain is value-checked
    by one composed oracle (``corpus_prep`` in __ray_entry__)."""
    from ..stages import corpus

    cleaned = clean_documents(
        sf_dir, min_tokens=min_tokens, num_partitions=num_partitions
    )

    bench = read_benchmark_docs(sf_dir)
    decon = corpus.decontaminate(
        cleaned, bench, shingle_k=3, keep_cols=["n_tokens", "n_copies"]
    )

    def finalize(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.less(batch["overlap_x1000"], max_overlap_x1000)
        )
        labels = corpus.hash_split_batch(batch.select(["doc_id"]))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": batch["n_tokens"],
                "n_copies": batch["n_copies"],
                "split": labels["split"],
            }
        )

    return decon.map_batches(finalize, batch_format="pyarrow")


def read_benchmark_docs(sf_dir: str) -> Dataset:
    """The deterministic eval subset (every 50th doc_id) used for
    decontamination — the broadcast side."""
    from ..sources.parquet import read_parquet_clean

    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def _mask(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 50 == 0))

    return ds.map_batches(_mask, batch_format="pyarrow")
