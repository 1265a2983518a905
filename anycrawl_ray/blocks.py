"""Safe materialization of small result Datasets to Arrow blocks.

``Dataset.to_arrow_refs()`` follows its full execution with
``schema(fetch_if_missing=True)``. When the executed stream contained empty
ZERO-SCHEMA blocks — which Ray's sort-based ``groupby().aggregate()`` and
``map_groups`` routinely emit for empty partitions — the unified schema is
still unknown after execution, so the probe RE-EXECUTES the entire upstream
plan under a ``LimitOperator[limit=1]``. That is wasteful (the pipeline runs
twice) and, on Ray 2.49, aborts the whole driver process in a measurable
fraction of runs: the limit's task cancellations race late task completions
in the core worker's TaskManager (``task_manager.cc Check failed: it !=
submissible_tasks_.end()``). Observed twice in full bench runs before this
helper existed.

``collect_tables`` pulls the executed block refs straight from
``iter_internal_ref_bundles()``: exactly one execution, no schema probe.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd


def collect_tables(ds: rd.Dataset) -> list[pa.Table]:
    """Execute ``ds`` once and return its non-empty blocks as Arrow tables
    (pandas blocks converted), without any schema probe."""
    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    blocks = ray.get(refs)
    tables = [t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
              for t in blocks]
    return [t for t in tables if t.num_rows > 0]
