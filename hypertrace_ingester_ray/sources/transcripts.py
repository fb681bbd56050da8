"""Transcript table sources.

The engine's input contract is a Parquet table of multi-turn conversation /
agent transcripts ``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp)`` — the analog of the reference's ``jaeger-spans``
input topic (span-normalizer/.../SpanNormalizer.java:55-61).

Two deterministic sources are provided:

1. ``transcripts_from_events(sf_dir)`` — derives the transcript table from the
   driver's ``events`` Parquet table with a fixed, SQL-mirrorable mapping
   (``TRANSCRIPTS_CTE`` is the byte-identical DuckDB derivation used by the
   correctness oracles).  ``turn_idx`` is the per-conversation rank by
   ``(ts, event_id)`` — computed with the same hash-partitioned vectorized
   group pass the pipeline itself uses.

2. ``generate_synown corpus`` — ``write_synthetic_transcripts`` emits a seeded
   synthetic corpus (zipf-skewed conversation sizes, duplicate turns, error
   injection) used by benchmarks and resume tests; no external data.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data
from ray.data import Dataset

from ..stages.grouping import (
    group_apply,
    run_boundaries,
    segment_ids_from_boundaries,
    segmented_cumcount,
)

TOOLS = ["http", "db", "search", "code", "shell"]
# v4: the error-status table spans 4xx and 5xx families so the full
# HttpCodeMapper table (E2 depth) is exercised by the oracles
ERROR_STATUSES = [500, 503, 429, 502, 504, 401, 403, 410]

# ---------------------------------------------------------------------------
# DuckDB-side derivation — keep in exact lockstep with derive_turns_batch().
# Oracle queries do `WITH {TRANSCRIPTS_CTE} SELECT ... FROM transcripts`.
# v4 text format: wider status set (2xx/3xx/4xx/5xx), per-protocol extra
# query params (stmt/body/proc/hdr — the M8 priority-key corpus), and a
# trailing grpc_status token on GRPC (code-tool) turns for GrpcCodeMapper.
# ---------------------------------------------------------------------------
TRANSCRIPTS_CTE = """
ev0 AS (
  SELECT event_id, ts, user_id, event_type, value,
         CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) AS k
  FROM events
),
ev1 AS (
  SELECT *,
    CASE WHEN event_type IN ('signup','purchase') THEN 'POST' ELSE 'GET' END AS method,
    CASE WHEN event_type = 'error'
         THEN (CASE k % 8 WHEN 0 THEN 500 WHEN 1 THEN 503 WHEN 2 THEN 429
               WHEN 3 THEN 502 WHEN 4 THEN 504 WHEN 5 THEN 401
               WHEN 6 THEN 403 ELSE 410 END)
         WHEN k % 10 = 0 THEN 404
         WHEN k % 10 = 7 THEN 301
         WHEN k % 10 = 3 THEN 201
         ELSE 200 END AS status,
    CAST(floor(value * 10) AS BIGINT) AS dur_ms,
    event_id % 4096 AS bytes,
    CASE WHEN event_type IN ('purchase','error')
         THEN (CASE k % 5 WHEN 0 THEN 'http' WHEN 1 THEN 'db'
               WHEN 2 THEN 'search' WHEN 3 THEN 'code' ELSE 'shell' END)
         ELSE NULL END AS tool
  FROM ev0
),
ev2 AS (
  SELECT *,
    COALESCE(CASE WHEN tool = 'db' AND k % 3 > 0
         THEN '&stmt=select%20' || CAST(k % 9 AS VARCHAR) END, '')
    || COALESCE(CASE WHEN tool = 'code' AND k % 3 > 0
         THEN '&body=msg%20' || CAST(k % 9 AS VARCHAR) END, '')
    || COALESCE(CASE WHEN tool = 'shell' AND k % 3 > 0
         THEN '&proc=run%20' || CAST(k % 9 AS VARCHAR) END, '')
    || COALESCE(CASE WHEN k % 4 = 0
         THEN '&hdr=x%20' || CAST(k % 5 AS VARCHAR) END, '') AS extra_params,
    COALESCE(CASE WHEN tool = 'code' THEN ' grpc_status='
         || CAST(CASE WHEN status >= 400 THEN 1 + (k % 16) ELSE 0 END
                 AS VARCHAR) END, '') AS grpc_tok
  FROM ev1
),
transcripts AS (
  SELECT
    'conv_' || CAST(user_id AS VARCHAR) AS conv_id,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
         AS INTEGER) AS turn_idx,
    CASE WHEN event_type IN ('click','view') THEN 'user'
         WHEN event_type IN ('signup','purchase') THEN 'assistant'
         ELSE 'tool' END AS role,
    method || ' /api/v1/' || event_type || '/' || CAST(k AS VARCHAR)
      || '?page=' || CAST(k % 7 AS VARCHAR) || '&q=' || event_type
      || '&tag=alpha&tag=beta%20' || CAST(k % 3 AS VARCHAR)
      || extra_params
      || ' HTTP/1.1 status=' || CAST(status AS VARCHAR)
      || ' dur_ms=' || CAST(dur_ms AS VARCHAR)
      || ' bytes=' || CAST(bytes AS VARCHAR)
      || grpc_tok AS text,
    tool,
    ts
  FROM ev2
)
"""


def _str(arr) -> pa.Array:
    return pc.cast(arr, pa.string())


def _v4_text_tokens(tool: np.ndarray, k_np: np.ndarray, status: np.ndarray):
    """The v4 conditional text tokens, shared by both generators (keep in
    exact lockstep with ev2 in TRANSCRIPTS_CTE):

    - per-protocol extra query params ``stmt``/``body``/``proc`` (present on
      2/3 of each tool's rows) + ``hdr`` (every 4th row) — the sparse
      priority-key corpus for the M8 field registry;
    - trailing `` grpc_status=G`` on GRPC (code-tool) turns: 0 when the
      http-status family is success, 1..16 otherwise (GrpcCodeMapper corpus).
    """
    k9 = (k_np % 9).astype(str)
    has3 = k_np % 3 > 0
    stmt = np.where((tool == "db") & has3, np.char.add("&stmt=select%20", k9), "")
    body = np.where((tool == "code") & has3, np.char.add("&body=msg%20", k9), "")
    proc = np.where((tool == "shell") & has3, np.char.add("&proc=run%20", k9), "")
    hdr = np.where(
        k_np % 4 == 0, np.char.add("&hdr=x%20", (k_np % 5).astype(str)), ""
    )
    extra = np.char.add(np.char.add(stmt.astype(str), body.astype(str)),
                        np.char.add(proc.astype(str), hdr.astype(str)))
    grpc_code = np.where(status >= 400, 1 + (k_np % 16), 0)
    grpc_tok = np.where(
        tool == "code",
        np.char.add(" grpc_status=", grpc_code.astype(str)),
        "",
    )
    return extra, grpc_tok.astype(str)


def derive_turns_batch(batch: pa.Table) -> pa.Table:
    """events rows → transcript rows (minus turn_idx), fully vectorized.

    Mirrors TRANSCRIPTS_CTE column-for-column; the per-record parse stage
    analog of JaegerSpanPreProcessor.java:100-128 run over Arrow batches.
    """
    n = batch.num_rows
    etype = batch["event_type"].combine_chunks()
    k = pc.cast(
        pc.struct_field(pc.extract_regex(batch["props"], r'"k": (?P<k>\d+)'), "k"),
        pa.int32(),
    )
    k_np = k.to_numpy(zero_copy_only=False).astype(np.int64)
    etype_np = np.asarray(etype.to_pandas(), dtype=object)

    is_user = np.isin(etype_np, ["click", "view"])
    is_assistant = np.isin(etype_np, ["signup", "purchase"])
    is_error_ev = etype_np == "error"
    has_tool = np.isin(etype_np, ["purchase", "error"])

    role = np.where(is_user, "user", np.where(is_assistant, "assistant", "tool"))

    tool = np.array(TOOLS, dtype=object)[k_np % 5]
    tool = np.where(has_tool, tool, None)

    status = np.select(
        [k_np % 10 == 0, k_np % 10 == 7, k_np % 10 == 3],
        [404, 301, 201],
        default=200,
    )
    err_status = np.array(ERROR_STATUSES, dtype=np.int64)[k_np % 8]
    status = np.where(is_error_ev, err_status, status)

    value = batch["value"].combine_chunks().to_numpy(zero_copy_only=False)
    dur_ms = np.floor(value * 10).astype(np.int64)
    event_id = batch["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
    bytes_ = event_id % 4096
    method = np.where(np.isin(etype_np, ["signup", "purchase"]), "POST", "GET")

    user_id = batch["user_id"].combine_chunks()
    conv_id = pc.binary_join_element_wise("conv_", _str(user_id), "")

    extra_params, grpc_tok = _v4_text_tokens(tool, k_np, status)

    text = pc.binary_join_element_wise(
        pa.array(method),
        " /api/v1/",
        etype,
        "/",
        _str(k),
        "?page=",
        _str(pa.array(k_np % 7)),
        "&q=",
        etype,
        "&tag=alpha&tag=beta%20",
        _str(pa.array(k_np % 3)),
        pa.array(extra_params, pa.string()),
        " HTTP/1.1 status=",
        _str(pa.array(status)),
        " dur_ms=",
        _str(pa.array(dur_ms)),
        " bytes=",
        _str(pa.array(bytes_)),
        pa.array(grpc_tok, pa.string()),
        "",
    )

    return pa.table(
        {
            "conv_id": conv_id,
            "role": pa.array(role, pa.string()),
            "text": text,
            "tool": pa.array(tool, pa.string()),
            "ts": batch["ts"],
            "_eid": batch["event_id"],
        }
    )


def _assign_turn_idx(part: pa.Table) -> pa.Table:
    """Per-conversation 0-based rank by (ts, _eid); input sorted by
    (conv_id, ts, _eid) by group_apply."""
    conv = part["conv_id"].combine_chunks().dictionary_encode()
    codes = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    bounds = run_boundaries(codes)
    seg = segment_ids_from_boundaries(bounds)
    turn_idx = segmented_cumcount(seg).astype(np.int32)
    part = part.append_column("turn_idx", pa.array(turn_idx))
    return part.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"])


def transcripts_from_events(sf_dir: str, **group_kwargs) -> Dataset:
    """Derive the canonical transcript Dataset from ``{sf_dir}/events.parquet``."""
    from .parquet import read_parquet_clean

    ds = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    ds = ds.map_batches(derive_turns_batch, batch_format="pyarrow")
    return group_apply(
        ds, "conv_id", _assign_turn_idx, sort_by=["ts", "_eid"], **group_kwargs
    )


def read_transcripts(path: str) -> Dataset:
    """Read an on-disk transcript Parquet corpus (file or directory)."""
    from .parquet import read_parquet_clean

    return read_parquet_clean(path)


# ---------------------------------------------------------------------------
# synthetic corpus (bench / resume / skew tests) — deterministic, seeded
# ---------------------------------------------------------------------------


def synthesize_batch(
    conv_start: int,
    n_convs: int,
    *,
    seed: int = 42,
    mean_turns: int = 24,
    dup_rate: float = 0.01,
    hot_conv_every: int = 0,
    hot_turns: int = 5000,
) -> pa.Table:
    """Deterministic transcript rows for conversations [conv_start, conv_start+n_convs).

    The shard RNG is seeded by (seed, conv_start), so a fixed sharding scheme
    regenerates byte-identical files (resume-friendly writes below).
    """
    rng = np.random.default_rng(np.uint64(seed) * np.uint64(1_000_003) + np.uint64(conv_start))
    conv_ids = np.arange(conv_start, conv_start + n_convs, dtype=np.int64)
    n_turns = rng.poisson(mean_turns, n_convs).clip(2, None)
    if hot_conv_every:
        hot = conv_ids % hot_conv_every == 0
        n_turns = np.where(hot, hot_turns, n_turns)
    total = int(n_turns.sum())

    conv_rep = np.repeat(conv_ids, n_turns)
    turn_idx = segmented_cumcount(conv_rep).astype(np.int32)

    # role cycle: user → assistant → (tool?) …; deterministic per row
    r = rng.random(total)
    first = turn_idx == 0
    role = np.where(r < 0.4, "user", np.where(r < 0.75, "assistant", "tool"))
    role = np.where(first, "user", role)

    k = rng.integers(0, 100, total)
    etype = np.where(
        role == "user",
        np.where(k % 2 == 0, "click", "view"),
        np.where(
            role == "assistant",
            np.where(k % 2 == 0, "signup", "purchase"),
            "error",
        ),
    )
    has_tool = (role == "tool") | (etype == "purchase")
    tool = np.where(has_tool, np.array(TOOLS, dtype=object)[k % 5], None)

    is_err = (role == "tool") & (rng.random(total) < 0.25)
    status = np.select(
        [k % 10 == 0, k % 10 == 7, k % 10 == 3], [404, 301, 201], default=200
    )
    status = np.where(is_err, np.array(ERROR_STATUSES)[k % 8], status)
    dur_ms = rng.integers(1, 2000, total)
    bytes_ = rng.integers(0, 4096, total)
    method = np.where(np.isin(etype, ["signup", "purchase"]), "POST", "GET")

    base_ts = np.int64(1_704_067_200_000_000)  # 2024-01-01 UTC in us
    # conversations start spread over ~1 day, turns 1-10 s apart — realistic
    # telemetry time density so windowed aggregation has real fan-in
    conv_offset = (conv_rep * 97_003) % np.int64(86_400_000_000)
    gaps = rng.integers(1_000_000, 10_000_000, total)  # 1–10 s between turns
    ts = base_ts + conv_offset + np.cumsum(gaps) - np.repeat(
        np.concatenate(([0], np.cumsum(gaps)[np.cumsum(n_turns)[:-1] - 1])), n_turns
    )

    extra_params, grpc_tok = _v4_text_tokens(tool, k, status)
    query = np.char.add(
        np.char.add(
            np.char.add(
                np.char.add("?page=", (k % 7).astype(str)),
                np.char.add("&q=", etype.astype(str)),
            ),
            np.char.add("&tag=alpha&tag=beta%20", (k % 3).astype(str)),
        ),
        extra_params,
    )
    text = np.char.add(
        np.char.add(
            np.char.add(
                np.char.add(method.astype(str), np.char.add(" /api/v1/", etype.astype(str))),
                np.char.add(np.char.add("/", k.astype(str)), query),
            ),
            np.char.add(
                np.char.add(" HTTP/1.1 status=", status.astype(str)),
                np.char.add(
                    np.char.add(" dur_ms=", dur_ms.astype(str)),
                    np.char.add(" bytes=", bytes_.astype(str)),
                ),
            ),
        ),
        grpc_tok,
    )

    tbl = pa.table(
        {
            "conv_id": pa.array(np.char.add("conv_", conv_rep.astype(str)), pa.string()),
            "turn_idx": pa.array(turn_idx),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
        }
    )

    if dup_rate > 0 and total > 0:
        n_dup = int(total * dup_rate)
        dup_idx = rng.integers(0, total, n_dup)
        tbl = pa.concat_tables([tbl, tbl.take(pa.array(dup_idx))])
    return tbl


def _write_shard(args) -> str:
    out_dir, start, n, seed, kwargs = args
    path = os.path.join(out_dir, f"part-{start:08d}.parquet")
    if not os.path.exists(path):
        tbl = synthesize_batch(start, n, seed=seed, **kwargs)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.rename(tmp, path)
    return path


def write_synthetic_transcripts(
    out_dir: str,
    *,
    n_convs: int = 10_000,
    convs_per_file: int = 2_000,
    seed: int = 42,
    max_workers: int = 16,
    **kwargs,
) -> str:
    """Write a sharded synthetic corpus: one Parquet file per conversation
    range.  Shards are deterministic and skipped if already present (resume-
    friendly); generation fans out over processes."""
    os.makedirs(out_dir, exist_ok=True)
    jobs = [
        (out_dir, start, min(convs_per_file, n_convs - start), seed, kwargs)
        for start in range(0, n_convs, convs_per_file)
        if not os.path.exists(os.path.join(out_dir, f"part-{start:08d}.parquet"))
    ]
    if len(jobs) <= 1:
        for j in jobs:
            _write_shard(j)
    else:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=max_workers) as ex:
            list(ex.map(_write_shard, jobs))
    return out_dir
