"""Row-expansion (flat_map) operators — the raw-logs side-output analog.

Reference: ``JaegerSpanToLogRecordsTransformer`` explodes each span's log
records into ``LogEvents`` rows on the ``raw-logs`` side topic
(/root/reference/span-normalizer/.../jaeger/JaegerSpanToLogRecordsTransformer.java:55-107,
wired at SpanNormalizer.java:82).  Transcript analog: a turn's text explodes
into one row per token/line, keyed back to ``(conv_id, turn_idx)``.

Implemented as a vectorized batch transform (offsets → np.repeat), NOT
``ds.flat_map`` over Python rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def explode_tokens_batch(batch: pa.Table, *, sep: str = " ") -> pa.Table:
    """One output row per token of ``text``: (conv_id, turn_idx, token_idx,
    token).  Pure Arrow/numpy; list offsets drive the row expansion."""
    tokens = pc.split_pattern(batch["text"], sep).combine_chunks()
    offsets = tokens.offsets.to_numpy(zero_copy_only=False)
    counts = np.diff(offsets)
    parent = np.repeat(np.arange(batch.num_rows, dtype=np.int64), counts)
    token_idx = (np.arange(int(counts.sum()), dtype=np.int64) -
                 np.repeat(offsets[:-1], counts) + 1).astype(np.int32)
    parent_idx = pa.array(parent)
    return pa.table(
        {
            "conv_id": batch["conv_id"].take(parent_idx),
            "turn_idx": batch["turn_idx"].take(parent_idx),
            "token_idx": pa.array(token_idx),
            "token": tokens.flatten(),
        }
    )


def explode_tokens(ds: Dataset, *, sep: str = " ") -> Dataset:
    return ds.map_batches(
        explode_tokens_batch, batch_format="pyarrow", fn_kwargs={"sep": sep}
    )
