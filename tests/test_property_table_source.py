"""Property-based check: the table_changes stream reader's EXECUTOR read
path (driver-side manifest planning + per-file pyarrow reads) serves
byte-identical rows to the batch `read_changes` feed for arbitrary epoch
batchings of adversarial changelogs — without spinning Spark's streaming
machinery, so hypothesis can afford real example counts.

Exercised directly: offset planning (initialOffset → latestOffset →
partitions over arbitrary split points), the per-file arrow read with
schema NULL-fill, tombstone → delete classification, and the
epoch-attribution column.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mas_scada_bulkingest_spark.pipeline import (
    apply_changes,
    create_transcripts_table,
)
from mas_scada_bulkingest_spark.streaming.table_source import (
    TableChangesDataSource,
    TableChangesStreamReader,
)

_BASE_TS = datetime(2024, 1, 1)

_COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)

_event = st.tuples(
    st.integers(min_value=1, max_value=40),      # lsn
    st.sampled_from(["insert", "update", "delete"]),
    st.integers(min_value=0, max_value=3),       # conv
    st.integers(min_value=0, max_value=2),       # turn
    st.integers(min_value=0, max_value=5),       # ts offset (ties likely)
)


def _row(lsn, op, conv, turn, dt_s):
    dead = op == "delete"
    return (
        lsn,
        op,
        f"c{conv}",
        turn,
        None if dead else "u",
        None if dead else f"t{lsn}",
        None,
        _BASE_TS + timedelta(seconds=dt_s),
    )


@st.composite
def _epoched_log(draw):
    events = draw(st.lists(_event, min_size=1, max_size=20, unique_by=lambda e: e[0]))
    n_epochs = draw(st.integers(min_value=1, max_value=4))
    assignment = [draw(st.integers(min_value=0, max_value=n_epochs - 1)) for _ in events]
    # offsets the simulated triggers stop at (arbitrary batching of epochs)
    splits = sorted(draw(st.sets(st.integers(min_value=0, max_value=n_epochs - 1))))
    return events, n_epochs, assignment, splits


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.data_too_large],
)
@given(_epoched_log())
def test_reader_serves_batch_feed_for_any_batching(spark, tmpdir_path, case):
    events, n_epochs, assignment, splits = case
    import tempfile

    d = tempfile.mkdtemp(prefix="prop-src-", dir=tmpdir_path)
    tbl = create_transcripts_table(spark, d + "/t", n_buckets=2, mode="mor")
    for e in range(n_epochs):
        batch = [
            _row(*ev) for ev, a in zip(events, assignment) if a == e
        ]
        if not batch:
            batch = []
        df = spark.createDataFrame(batch, _COLS)
        apply_changes(tbl, df, e)

    ds = TableChangesDataSource({"path": tbl.path})
    r = TableChangesStreamReader(ds.schema(), {"path": tbl.path})
    offsets = [r.initialOffset()] + [{"epoch": s} for s in splits] + [r.latestOffset()]
    # drop non-monotone duplicates the way Spark's trigger loop would
    mono = [offsets[0]]
    for o in offsets[1:]:
        if o["epoch"] > mono[-1]["epoch"]:
            mono.append(o)

    frames = []
    for lo, hi in zip(mono, mono[1:]):
        for part in r.partitions(lo, hi):
            for batch in r.read(part):
                frames.append(pa.Table.from_batches([batch]).to_pandas())
    got = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame(columns=[f.name for f in ds.schema().fields])
    )
    expect = tbl.read_changes(0).toPandas()
    key = ["_change_epoch", "conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[expect.columns],
        expect.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
