"""Resumable partitioned-parquet sink.

The 100-TB output contract (build brief "Resumable output"): never one giant
file — one directory per key partition, each committed ATOMICALLY (data file
written to a tmp name, renamed, then a ``_SUCCESS`` marker with a write id),
so a failed run resumes by (a) discovering completed partitions from their
markers and (b) filtering finished partitions out of the INPUT stream before
any recompute happens — completed work is skipped at the read, not rewritten.

Shape notes for scale:
- the partition id is a CLOSED-FORM multiplicative hash of the key column
  (same Knuth constant as ``q_train_split``), so partition assignment is
  reproducible across runs/cluster sizes and mirrorable in SQL — which is
  what makes the sink's ack table oracle-checkable;
- one ``groupby(part)`` shuffle is the price of partition-atomic files; when
  the stream is ALREADY partitioned by the producer (the crawl's per-round
  span chunks in `stages/fetch.py`), the workers write directly and this
  sink is not needed — this is the generic path for query outputs;
- each group task writes ITS partition and returns a tiny ack row, so the
  driver never sees data rows, only the (part, n_rows) acks.

Reference analog: job_results batch flush + resume-from-checkpoint
(`packages/scrape/src/core/storage.ts`, job re-entry semantics); re-expressed
as a Dataset sink rather than a row-at-a-time DB upsert.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Knuth multiplicative hash (public domain) — keep in sync with the SQL
# mirror in queries.build_oracle_sql()["resumable_write"].
HASH_K = 2654435761
HASH_M = 4294967296

_MARKER = "_SUCCESS"


def partition_ids(keys: np.ndarray, n_parts: int) -> np.ndarray:
    """Closed-form partition assignment for an int64 key column.

    The multiply runs in uint64 (wrapping mod 2^64) so keys above ~3.5e9
    hash identically here and in the SQL mirror's UHUGEINT-mod-2^64
    arithmetic — int64 would wrap *signed* where BIGINT SQL raises,
    breaking cross-engine reproducibility exactly at design scale."""
    with np.errstate(over="ignore"):
        h = (keys.astype(np.uint64) * np.uint64(HASH_K)) % np.uint64(HASH_M)
    return (h % np.uint64(n_parts)).astype(np.int64)


def completed_parts(out_dir: str) -> dict[int, dict]:
    """Partition id → marker payload for every committed partition."""
    done: dict[int, dict] = {}
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if not name.startswith("part="):
            continue
        marker = os.path.join(out_dir, name, _MARKER)
        if os.path.exists(marker):
            with open(marker) as f:
                done[int(name.split("=", 1)[1])] = json.load(f)
    return done


def resumable_partitioned_write(
    ds,
    out_dir: str,
    key_col: str,
    n_parts: int = 64,
    fail_parts: frozenset[int] = frozenset(),
) -> pa.Table:
    """Write ``ds`` to ``out_dir/part=K/`` dirs, skipping partitions already
    committed by a previous (possibly crashed) run. Returns the ack table
    (part, n_rows) covering ALL committed partitions, prior + new.

    ``fail_parts`` is a test hook: those partitions raise before commit,
    simulating a mid-job crash AFTER other partitions committed.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = completed_parts(out_dir)
    done_arr = np.fromiter(done.keys(), dtype=np.int64) if done else np.empty(0, np.int64)

    def assign_and_prune(t: pa.Table) -> pa.Table:
        part = partition_ids(t.column(key_col).to_numpy(), n_parts)
        keep = ~np.isin(part, done_arr)  # skip finished partitions at the read
        return t.filter(pa.array(keep)).append_column(
            "part", pa.array(part[keep], pa.int64())
        )

    def write_part(t: pa.Table) -> pa.Table:
        pid = int(t.column("part")[0].as_py())
        if pid in fail_parts:
            import time

            time.sleep(1.0)  # let sibling partitions commit, as a real crash would
            raise RuntimeError(f"injected crash before committing part={pid}")
        pdir = os.path.join(out_dir, f"part={pid}")
        os.makedirs(pdir, exist_ok=True)
        body = t.drop_columns(["part"])
        tmp = os.path.join(pdir, f".tmp-{uuid.uuid4().hex}")
        final = os.path.join(pdir, "data.parquet")
        pq.write_table(body, tmp)
        os.replace(tmp, final)  # atomic within the filesystem
        with open(os.path.join(pdir, _MARKER + ".tmp"), "w") as f:
            json.dump({"n_rows": body.num_rows, "write_id": uuid.uuid4().hex}, f)
        os.replace(os.path.join(pdir, _MARKER + ".tmp"), os.path.join(pdir, _MARKER))
        return pa.table(
            {"part": pa.array([pid], pa.int64()),
             "n_rows": pa.array([body.num_rows], pa.int64())}
        )

    pruned = ds.map_batches(assign_and_prune, batch_format="pyarrow")
    acks = pruned.groupby("part").map_groups(write_part, batch_format="pyarrow")
    import ray

    from .blocks import collect_tables

    # map_groups acks include empty zero-schema blocks — collect block refs
    # directly (to_arrow_refs' schema probe would re-execute the write plan
    # under a limit: double-writes AND a driver-abort race; see blocks.py)
    new = collect_tables(acks)
    rows: dict[int, int] = {}
    if new:
        acks_t = pa.concat_tables(new)
        rows = dict(
            zip(acks_t.column("part").to_pylist(), acks_t.column("n_rows").to_pylist())
        )
    for pid, meta in done.items():
        rows[pid] = meta["n_rows"]
    parts = sorted(rows)
    return pa.table(
        {"part": pa.array(parts, pa.int64()),
         "n_rows": pa.array([rows[p] for p in parts], pa.int64())}
    )


def read_partitioned(out_dir: str):
    """ray.data reader over COMMITTED partitions only (ignores the debris of
    a crashed incarnation — uncommitted dirs have no marker)."""
    import ray.data as rd

    files = [
        os.path.join(out_dir, f"part={pid}", "data.parquet")
        for pid in sorted(completed_parts(out_dir))
    ]
    if not files:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    return rd.read_parquet(files)
