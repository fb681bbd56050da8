"""Incremental (new-files-only) processing: the batch translation of the
reference's Kafka consumer-offset commits.

The reference never reprocesses a record because the consumer group commits
offsets after each successfully produced output batch
(/root/reference/span-normalizer/span-normalizer/src/main/java/org/
hypertrace/core/spannormalizer/SpanNormalizer.java — Kafka Streams
at-least-once with committed offsets).  For Parquet-landing-zone input the
equivalent durable cursor is a FILE watermark: a committed ledger of input
files already processed (identity = path + size + mtime), so a scheduled
re-run over a growing directory touches only the delta.

Design points:
- the ledger commit is atomic (tmp + rename) and happens ONLY after the
  generation's processing function returns, so a crashed run reprocesses
  its in-flight generation (at-least-once, like the reference); the
  per-partition CRC manifests of the sinks make that rerun idempotent.
- each increment writes under ``out_dir/gen-NNNN`` — append-only
  generations, never rewriting committed output (resumable-output rule:
  one directory per input shard).
- the driver state is one row per input FILE — at 100 TB with ~1 GB files
  that is ~10^5 entries, trivially driver-sized.
"""

from __future__ import annotations

import json
import os
from typing import Callable, List, Optional

LEDGER = "_input_ledger.json"


def _file_identity(path: str) -> dict:
    st = os.stat(path)
    return {"path": path, "size": st.st_size, "mtime_ns": st.st_mtime_ns}


def load_ledger(out_dir: str) -> dict:
    path = os.path.join(out_dir, LEDGER)
    if not os.path.exists(path):
        return {"generations": []}
    with open(path) as f:
        return json.load(f)


def _commit_ledger(out_dir: str, ledger: dict) -> None:
    path = os.path.join(out_dir, LEDGER)
    with open(path + ".tmp", "w") as f:
        json.dump(ledger, f, indent=2, sort_keys=True)
    os.rename(path + ".tmp", path)


def pending_files(in_dir: str, out_dir: str, *, suffix: str = ".parquet") -> List[str]:
    """Input files not yet committed to the ledger.  A file whose size or
    mtime changed since it was committed raises — input files must be
    immutable once landed (rewrite-in-place would silently double-count)."""
    ledger = load_ledger(out_dir)
    seen = {}
    for gen in ledger["generations"]:
        for f in gen["files"]:
            seen[f["path"]] = f
    out = []
    for name in sorted(os.listdir(in_dir)):
        if not name.endswith(suffix):
            continue
        path = os.path.join(in_dir, name)
        ident = _file_identity(path)
        prev = seen.get(path)
        if prev is None:
            out.append(path)
        elif prev["size"] != ident["size"] or prev["mtime_ns"] != ident["mtime_ns"]:
            raise ValueError(
                f"committed input file changed on disk: {path} "
                "(landed files must be immutable)"
            )
    return out


def run_incremental(
    in_dir: str,
    out_dir: str,
    process: Callable[[List[str], str], dict],
    *,
    suffix: str = ".parquet",
) -> Optional[dict]:
    """Process only the input files not yet committed: calls
    ``process(new_files, gen_dir)`` with a fresh ``out_dir/gen-NNNN``
    directory, then commits the files to the ledger.  Returns the process
    summary plus generation metadata, or ``None`` when nothing is new.

    At-least-once: a crash after processing but before the ledger commit
    reprocesses the same generation next run — ``gen_dir`` is deterministic
    for a given generation index and the partitioned sinks' CRC manifests
    make the rerun skip committed partitions.
    """
    files = pending_files(in_dir, out_dir, suffix=suffix)
    if not files:
        return None
    ledger = load_ledger(out_dir)
    gen_id = len(ledger["generations"])
    gen_dir = os.path.join(out_dir, f"gen-{gen_id:04d}")
    os.makedirs(gen_dir, exist_ok=True)
    summary = process(files, gen_dir)
    ledger["generations"].append(
        {
            "gen": gen_id,
            "dir": gen_dir,
            "files": [_file_identity(p) for p in files],
            "summary": {k: v for k, v in (summary or {}).items() if k != "view_counts"}
            | {"view_counts": (summary or {}).get("view_counts")},
        }
    )
    _commit_ledger(out_dir, ledger)
    return {"gen": gen_id, "gen_dir": gen_dir, "n_files": len(files), **(summary or {})}
