"""Property tests: WAL segmentation/truncation/replay invariants under
arbitrary record streams and truncation points."""

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from miniodb_spark.buffer import WAL


@st.composite
def wal_workload(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    payload_sizes = draw(
        st.lists(st.integers(min_value=0, max_value=120), min_size=n, max_size=n)
    )
    seg_bytes = draw(st.integers(min_value=80, max_value=2000))
    cut = draw(st.integers(min_value=0, max_value=n))
    return payload_sizes, seg_bytes, cut


@given(wal_workload())
@settings(max_examples=40, deadline=None)
def test_truncate_then_replay_is_suffix(tmp_path_factory, workload):
    payload_sizes, seg_bytes, cut = workload
    d = tmp_path_factory.mktemp("walprop")
    wal = WAL(str(d / "w.log"), max_segment_bytes=seg_bytes)
    seqs = []
    for i, sz in enumerate(payload_sizes):
        seqs.append(
            wal.append("insert", {"id": f"r{i}", "timestamp": i,
                                  "table_name": "t", "fields": {"pad": "x" * sz}})
        )
    cut_seq = seqs[cut - 1] if cut else 0
    wal.truncate_upto(cut_seq)
    # invariant 1: replay returns exactly the records after the cut, in order
    assert [r["seq"] for r in WAL.replay(wal.path)] == seqs[cut:]
    # invariant 2: appending after truncation continues the sequence
    s = wal.append("insert", {"id": "z", "timestamp": 0, "table_name": "t",
                              "fields": {}})
    assert s == seqs[-1] + 1
    # invariant 3: no temp files linger
    assert not [f for f in os.listdir(d) if f.endswith(".tmp")]
    wal.close()


@given(st.integers(min_value=1, max_value=40), st.integers(min_value=80, max_value=600))
@settings(max_examples=25, deadline=None)
def test_reopen_resumes_sequence(tmp_path_factory, n, seg_bytes):
    d = tmp_path_factory.mktemp("walprop2")
    wal = WAL(str(d / "w.log"), max_segment_bytes=seg_bytes)
    last = 0
    for i in range(n):
        last = wal.append("insert", {"id": f"r{i}", "timestamp": i,
                                     "table_name": "t", "fields": {"pad": "y" * 50}})
    wal.close()
    wal2 = WAL(str(d / "w.log"), max_segment_bytes=seg_bytes)
    assert wal2.append("t2", {"k": 1}) == last + 1
    assert len(WAL.replay(wal2.path)) == n + 1
    wal2.close()
