"""Columnar table storage: Lance when available, parquet otherwise.

The design target (BASELINE.json input_hint) stores interleaved-span docs,
frontier checkpoints and seen-set dumps as Lance tables (`ray.data.read_lance`
/ `lance.write_dataset`). This container ships pyarrow+parquet but NOT the
``lance``/``pylance`` package, so every write goes through this module:
Lance is attempted first and parquet is the tested fallback — same logical
tables, same partitioning (one directory per shard/round), same resume
semantics. Swapping in Lance on a cluster that has it is a no-op for callers.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - lance not present in this container
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False

FORMAT = "lance" if HAVE_LANCE else "parquet"


def table_uri(base: str, name: str) -> str:
    ext = "lance" if HAVE_LANCE else "parquet"
    return os.path.join(base, f"{name}.{ext}")


def write_table(table: pa.Table, uri: str) -> None:
    """Atomic single-table write (tmp + rename for parquet)."""
    os.makedirs(os.path.dirname(uri) or ".", exist_ok=True)
    if HAVE_LANCE and uri.endswith(".lance"):  # pragma: no cover
        lance.write_dataset(table, uri, mode="overwrite")
        return
    tmp = uri + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, uri)


def read_table(uri: str) -> pa.Table:
    if HAVE_LANCE and uri.endswith(".lance"):  # pragma: no cover
        return lance.dataset(uri).to_table()
    return pq.read_table(uri)


def read_dataset(uri_or_dir: str):
    """ray.data reader for a table/directory in the active format."""
    import ray.data as rd

    if HAVE_LANCE and uri_or_dir.endswith(".lance"):  # pragma: no cover
        return rd.read_lance(uri_or_dir)
    return rd.read_parquet(uri_or_dir)
