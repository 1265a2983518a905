"""Crash/resume contract of the resumable partitioned sink:

1. a run that crashes mid-job leaves committed partitions (marker + data)
   and NO marker for the crashed one;
2. the resumed run completes the job WITHOUT rewriting committed partitions
   (their write_ids are unchanged — skipped at the read, not recomputed);
3. read_partitioned() round-trips exactly the input rows;
4. a fully-committed re-run is a no-op that still reports the full ack set.
"""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anycrawl_ray import sinks  # noqa: E402

N_ROWS = 1000
N_PARTS = 8


def _input_ds():
    ids = np.arange(N_ROWS, dtype=np.int64)
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids), "payload": pa.array(ids * 7)})
    )


def test_crash_resume_skips_committed_partitions(ray_session, tmp_path):
    out = str(tmp_path / "sink")
    poison = 3  # this partition crashes before commit on the first run

    with pytest.raises(Exception):
        sinks.resumable_partitioned_write(
            _input_ds(), out, "doc_id", n_parts=N_PARTS,
            fail_parts=frozenset({poison}),
        )
    done1 = sinks.completed_parts(out)
    assert poison not in done1
    assert 0 < len(done1) < N_PARTS  # partial progress committed atomically
    ids1 = {p: m["write_id"] for p, m in done1.items()}

    acks = sinks.resumable_partitioned_write(
        _input_ds(), out, "doc_id", n_parts=N_PARTS
    )
    done2 = sinks.completed_parts(out)
    assert sorted(done2) == sorted(acks.column("part").to_pylist())
    # previously committed partitions were NOT rewritten
    for p, wid in ids1.items():
        assert done2[p]["write_id"] == wid, f"part={p} was rewritten on resume"
    # ack table covers every input row exactly once
    assert sum(acks.column("n_rows").to_pylist()) == N_ROWS

    got = sinks.read_partitioned(out).to_pandas().sort_values("doc_id")
    assert got["doc_id"].to_numpy().tolist() == list(range(N_ROWS))
    assert (got["payload"].to_numpy() == got["doc_id"].to_numpy() * 7).all()


def test_fully_committed_rerun_is_noop(ray_session, tmp_path):
    out = str(tmp_path / "sink")
    a1 = sinks.resumable_partitioned_write(_input_ds(), out, "doc_id", n_parts=N_PARTS)
    ids = {p: m["write_id"] for p, m in sinks.completed_parts(out).items()}
    a2 = sinks.resumable_partitioned_write(_input_ds(), out, "doc_id", n_parts=N_PARTS)
    pd.testing.assert_frame_equal(a1.to_pandas(), a2.to_pandas())
    for p, m in sinks.completed_parts(out).items():
        assert m["write_id"] == ids[p]


def test_partition_assignment_is_closed_form(ray_session):
    ids = np.arange(100, dtype=np.int64)
    part = sinks.partition_ids(ids, 16)
    assert (part == ((ids * sinks.HASH_K) % sinks.HASH_M) % 16).all()
    assert part.min() >= 0 and part.max() < 16
