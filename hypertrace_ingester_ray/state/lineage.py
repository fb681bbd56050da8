"""Per-partition lineage manifests + atomic, resumable sink writes.

The reference gets exactly-once-ish resume from Kafka consumer offsets plus
RocksDB changelog restore (/root/reference/hypertrace-metrics-generator/.../
MetricsProcessor.java:138-151; punctuator restore).  Ray Data has task retries
but no output transactionality, so the engine owns it (SURVEY.md §4):

- deterministic partition layout: partition i of a run always holds the same
  key-groups (hash(conv_id) % P with fixed P and a process-stable hash);
- every view file is written to ``<path>.tmp`` then ``os.rename``d (atomic on
  POSIX);
- a partition's JSON manifest is written LAST — it is the commit record.  A
  partition with a valid manifest is skipped on resume, so a killed run never
  produces duplicate or missing routed rows;
- the manifest carries lineage + metrics: input row count, per-sink routed row
  counts, dropped/dedup counts, and a content checksum.
"""

from __future__ import annotations

import json
import os
import zlib
from typing import Dict, Optional

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_DIR = "_manifests"
RUN_MANIFEST = "_run_manifest.json"


def part_file(out_dir: str, view: str, part_id: int) -> str:
    return os.path.join(out_dir, view, f"part-{part_id:05d}.parquet")


def manifest_path(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"part-{part_id:05d}.json")


def checksum_file(path: str) -> int:
    """Streaming CRC32 of the rendered part file — the content checksum the
    manifest commits to.  File-level (not row-level) on purpose: it detects
    torn/corrupted-but-present sink files on resume, is dtype-agnostic (map
    and list columns included), and costs one sequential read only on the
    resume path."""
    acc = 0
    with open(path, "rb") as f:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                return acc
            acc = zlib.crc32(chunk, acc)


class _Crc32Writer:
    """File wrapper that CRCs bytes as they stream through — the committed
    checksum costs no second read of the sink file."""

    def __init__(self, f):
        self._f = f
        self.crc = 0

    def write(self, data):
        b = bytes(data)
        self.crc = zlib.crc32(b, self.crc)
        return self._f.write(b)

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()

    @property
    def closed(self):
        return self._f.closed

    def tell(self):
        return self._f.tell()

    def seekable(self):
        return False

    def writable(self):
        return True

    def readable(self):
        return False


#: columns worth min/max statistics at the sink: the partition / time keys a
#: reader prunes row-groups on.  Stats for wide payload columns (text, tag
#: maps) cost ~25% of the write and prune nothing — skipped.
_STATS_COLUMNS = frozenset(
    {"tenant_id", "conv_id", "ts", "turn_idx", "window_ts", "service_name"}
)


def write_view_part(out_dir: str, view: str, part_id: int, table: pa.Table):
    """Atomically write one view partition file; returns (rows, checksum)."""
    path = part_file(out_dir, view, part_id)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    stats_cols = [c for c in table.schema.names if c in _STATS_COLUMNS]
    with open(tmp, "wb") as raw:
        w = _Crc32Writer(raw)
        pq.write_table(table, w, write_statistics=stats_cols)
    os.rename(tmp, path)
    return table.num_rows, w.crc


def load_manifest(out_dir: str, part_id: int) -> Optional[dict]:
    path = manifest_path(out_dir, part_id)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    # validate: every referenced sink file must exist AND match its committed
    # checksum (a manifest whose data files are missing or corrupted is
    # invalid and forces recompute)
    checksums = m.get("view_checksums", {})
    for view in m.get("view_counts", {}):
        fp = part_file(out_dir, view, part_id)
        if not os.path.exists(fp):
            return None
        want = checksums.get(view)
        if want is not None and checksum_file(fp) != want:
            return None
    return m


def commit_manifest(
    out_dir: str,
    part_id: int,
    *,
    rows_in: int,
    rows_deduped: int,
    rows_capped: int,
    view_counts: Dict[str, int],
    view_checksums: Optional[Dict[str, int]] = None,
    extra: Optional[dict] = None,
) -> dict:
    m = {
        "part_id": part_id,
        "rows_in": rows_in,
        "rows_deduped": rows_deduped,
        "rows_capped": rows_capped,
        "view_counts": view_counts,
        "view_checksums": view_checksums or {},
        **(extra or {}),
    }
    path = manifest_path(out_dir, part_id)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.rename(tmp, path)
    return m


def write_run_manifest(out_dir: str, summary: dict) -> None:
    path = os.path.join(out_dir, RUN_MANIFEST)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(summary, f, indent=2, default=str)
    os.rename(tmp, path)


def identity_guard(
    dir_path: str,
    meta: dict,
    *,
    loose: tuple = (),
    filename: str = "meta.json",
    has_prior_output=None,
    kind: str = "output dir",
) -> None:
    """Write-or-validate a run-identity record for a resumable directory.

    Resume manifests make re-runs skip committed work, which is only safe
    when the re-run IS the same run: same input, same config.  This is the
    one shared mechanism (used by the pipeline out_dir, bucketed-corpus
    dirs, and iterative graph checkpoints) — on first use it atomically
    writes ``filename``; on any later use it compares and raises on
    mismatch instead of silently serving stale results.

    ``loose`` keys may differ between runs (e.g. extending ``iters`` /
    ``max_hops`` of the SAME iterative job is a legitimate continuation).
    ``has_prior_output()`` says whether the dir already holds run output;
    output present without an identity record predates tracking (or belongs
    to something else) — refused rather than trusted.  Defaults to "any
    directory entry besides the record itself".
    """
    os.makedirs(dir_path, exist_ok=True)
    path = os.path.join(dir_path, filename)
    if os.path.exists(path):
        with open(path) as f:
            saved = json.load(f)
        mismatch = {
            k: {"saved": saved.get(k), "now": v}
            for k, v in meta.items()
            if k not in loose and saved.get(k) != v
        }
        if mismatch:
            raise ValueError(
                f"{kind} {dir_path!r} belongs to a different run "
                f"(mismatched identity: {mismatch}); resuming would "
                "silently produce wrong results — use a fresh dir"
            )
        return
    if has_prior_output is None:
        has_prior_output = lambda: any(
            e != filename for e in os.listdir(dir_path)
        )
    if has_prior_output():
        raise ValueError(
            f"{kind} {dir_path!r} holds prior output but no {filename} "
            "identity record; refusing to resume from an unidentified run "
            "— use a fresh dir"
        )
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, sort_keys=True)
    os.rename(tmp, path)
