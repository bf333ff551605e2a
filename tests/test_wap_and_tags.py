"""Write-audit-publish staging, named tags, and digest-pruned lookups.

The reference validates AFTER data is live (row-count checks post-commit in
ProcessTagData.java); WAP moves the audit BEFORE visibility — the staged
epoch is a fully materialized snapshot nothing points to, published (or
discarded) atomically. Tags are the Iceberg named-ref analog: a pinned
version that vacuum never expires. The per-file key digests are the
manifest-level bloom-filter analog that keeps point lookups O(epochs that
touched the key) under merge-on-read.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from mas_scada_bulkingest_spark.lake.snapshot_table import (
    ConcurrentCommitError,
    SnapshotTable,
)
from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table

COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)


def _t(s: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0, s)


def _batch(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _ins(lsn, conv, turn, text, s):
    return (lsn, "insert", conv, turn, "user", text, None, _t(s))


class TestWAP:
    def test_stage_is_invisible_until_published(self, spark, tmpdir_path):
        tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4, mode="mor")
        apply_changes(tbl, _batch(spark, [_ins(1, "c1", 0, "base", 1)]), 0)
        st = apply_changes(tbl, _batch(spark, [_ins(2, "c2", 0, "staged", 2)]), 1, stage=True)
        assert st.staged_ref and not st.was_noop and st.applied == 1
        # nothing committed: readers and the epoch log still see the parent
        assert not tbl.is_epoch_committed(1)
        assert tbl.read().count() == 1
        assert tbl.staged_refs() == [st.staged_ref]
        # the audit handle sees EXACTLY what publish would make visible
        audit = tbl.read_staged(st.staged_ref)
        texts = {r["text"] for r in audit.read().collect()}
        assert texts == {"base", "staged"}
        # audit passed -> publish atomically
        pub = tbl.publish_staged(st.staged_ref)
        assert not pub.was_noop and pub.applied == 1
        assert tbl.is_epoch_committed(1)
        assert tbl.read().count() == 2
        assert tbl.staged_refs() == []

    def test_publish_is_exactly_once(self, spark, tmpdir_path):
        tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4, mode="mor")
        st = apply_changes(tbl, _batch(spark, [_ins(1, "c1", 0, "x", 1)]), 0, stage=True)
        # the same epoch lands through the normal path first (dueling replays)
        apply_changes(tbl, _batch(spark, [_ins(1, "c1", 0, "x", 1)]), 0)
        pub = tbl.publish_staged(st.staged_ref)
        assert pub.was_noop
        assert tbl.read().count() == 1
        assert tbl.staged_refs() == []  # staged marker cleaned up

    def test_abort_discards_files_and_epoch_stays_replayable(self, spark, tmpdir_path):
        tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4, mode="mor")
        apply_changes(tbl, _batch(spark, [_ins(1, "c1", 0, "keep", 1)]), 0)
        st = apply_changes(tbl, _batch(spark, [_ins(2, "c2", 0, "bad", 2)]), 1, stage=True)
        removed = tbl.abort_staged(st.staged_ref)
        assert removed >= 1
        assert not tbl.is_epoch_committed(1)
        assert tbl.read().count() == 1
        # the corrected batch replays the SAME epoch id afterwards
        fixed = apply_changes(tbl, _batch(spark, [_ins(3, "c2", 0, "good", 3)]), 1)
        assert not fixed.was_noop
        assert {r["text"] for r in tbl.read().collect()} == {"keep", "good"}

    def test_mor_publish_rebases_over_intervening_commit(self, spark, tmpdir_path):
        tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4, mode="mor")
        apply_changes(tbl, _batch(spark, [_ins(1, "c1", 0, "v0", 1)]), 0)
        st = apply_changes(tbl, _batch(spark, [_ins(2, "c2", 0, "staged", 2)]), 1, stage=True)
        # another epoch commits normally between stage and publish
        apply_changes(tbl, _batch(spark, [_ins(3, "c3", 0, "mid", 3)]), 2)
        pub = tbl.publish_staged(st.staged_ref)
        assert not pub.was_noop
        assert tbl.is_epoch_committed(1) and tbl.is_epoch_committed(2)
        assert {r["text"] for r in tbl.read().collect()} == {"v0", "staged", "mid"}
        # LWW still holds across the grafted epoch: a stale cross-epoch
        # update for the staged key must lose at read time (MoR resolves
        # LWW on read; appends always count as applied)
        stale = (4, "update", "c2", 0, "user", "stale", None, _t(1))
        apply_changes(tbl, _batch(spark, [stale]), 3)
        got = {r["text"] for r in tbl.read().collect()}
        assert got == {"v0", "staged", "mid"}

    def test_cow_publish_refuses_after_intervening_commit(self, spark, tmpdir_path):
        tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4, mode="cow")
        apply_changes(tbl, _batch(spark, [_ins(1, "c1", 0, "v0", 1)]), 0)
        st = apply_changes(tbl, _batch(spark, [_ins(2, "c2", 0, "staged", 2)]), 1, stage=True)
        apply_changes(tbl, _batch(spark, [_ins(3, "c3", 0, "mid", 3)]), 2)
        with pytest.raises(ConcurrentCommitError):
            tbl.publish_staged(st.staged_ref)
        # abort + re-merge is the documented recovery
        tbl.abort_staged(st.staged_ref)
        apply_changes(tbl, _batch(spark, [_ins(2, "c2", 0, "staged", 2)]), 1)
        assert tbl.read().count() == 3

    def test_vacuum_never_reaps_staged_files(self, spark, tmpdir_path):
        tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4, mode="mor")
        st = apply_changes(tbl, _batch(spark, [_ins(1, "c1", 0, "pending", 1)]), 0, stage=True)
        # churn versions so vacuum has something to look at
        apply_changes(tbl, _batch(spark, [_ins(2, "c2", 0, "a", 2)]), 1)
        apply_changes(tbl, _batch(spark, [_ins(3, "c3", 0, "b", 3)]), 2)
        tbl.vacuum(retain_versions=1)
        # the staged epoch still publishes intact after the vacuum
        pub = tbl.publish_staged(st.staged_ref)
        assert not pub.was_noop
        assert {r["text"] for r in tbl.read().collect()} == {"pending", "a", "b"}

    def test_mor_publish_refuses_after_rebucket(self, spark, tmpdir_path):
        tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4, mode="mor")
        apply_changes(tbl, _batch(spark, [_ins(1, "c1", 0, "v0", 1)]), 0)
        st = apply_changes(tbl, _batch(spark, [_ins(2, "c2", 0, "staged", 2)]), 1, stage=True)
        tbl.rebucket(8)
        with pytest.raises(ConcurrentCommitError):
            tbl.publish_staged(st.staged_ref)


class TestWAPNonNumericEpochs:
    def test_stage_with_string_epoch_id(self, spark, tmpdir_path):
        """Non-numeric epoch ids (repair jobs, bootstrap-style names) carry
        epoch_num = -1 in the ref; staged_refs must not choke on them."""
        tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=2, mode="mor")
        st = apply_changes(tbl, _batch(spark, [_ins(1, "c1", 0, "x", 1)]), "repair-x", stage=True)
        st2 = apply_changes(tbl, _batch(spark, [_ins(2, "c2", 0, "y", 2)]), 5, stage=True)
        refs = tbl.staged_refs()
        assert set(refs) == {st.staged_ref, st2.staged_ref}
        assert refs[0] == st.staged_ref  # -1 sorts before 5
        tbl.publish_staged(st.staged_ref)
        tbl.publish_staged(st2.staged_ref)
        assert tbl.is_epoch_committed("repair-x") and tbl.is_epoch_committed(5)
        assert tbl.read().count() == 2


class TestTags:
    def test_tag_pins_a_version_through_vacuum(self, spark, tmpdir_path):
        tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4, mode="cow")
        apply_changes(tbl, _batch(spark, [_ins(1, "c1", 0, "v1", 1)]), 0)
        v_tagged = tbl.tag("audited")
        apply_changes(tbl, _batch(spark, [(2, "update", "c1", 0, "user", "v2", None, _t(2))]), 1)
        apply_changes(tbl, _batch(spark, [_ins(3, "c2", 0, "v3", 3)]), 2)
        tbl.vacuum(retain_versions=1)
        # the tagged version time-travels even though it is outside the window
        pinned = tbl.at_tag("audited")
        assert pinned._snapshot["version"] == v_tagged
        assert [r["text"] for r in pinned.read().collect()] == ["v1"]
        assert tbl.tags() == {"audited": v_tagged}
        # dropping the tag releases it to the next vacuum
        tbl.delete_tag("audited")
        tbl.vacuum(retain_versions=1)
        with pytest.raises(Exception):
            tbl.at_version(v_tagged).read().collect()

    def test_tag_create_semantics(self, spark, tmpdir_path):
        tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4)
        apply_changes(tbl, _batch(spark, [_ins(1, "c1", 0, "x", 1)]), 0)
        v = tbl.tag("r1")
        with pytest.raises(ValueError):
            tbl.tag("r1")  # no silent overwrite
        apply_changes(tbl, _batch(spark, [_ins(2, "c2", 0, "y", 2)]), 1)
        v2 = tbl.tag("r1", replace=True)
        assert v2 > v and tbl.tags()["r1"] == v2
        with pytest.raises(ValueError):
            tbl.tag("bad name!")
        with pytest.raises(ValueError):
            tbl.tag("ghost", version=999)
        with pytest.raises(ValueError):
            tbl.delete_tag("nope")
        with pytest.raises(ValueError):
            tbl.at_tag("nope")


class TestKeyDigests:
    def test_lookup_prunes_untouched_epoch_deltas(self, spark, tmpdir_path):
        tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=1, mode="mor")
        # 6 epochs, each touching ONE conversation; n_buckets=1 forces them
        # all into the same bucket so only the digest can prune
        for e in range(6):
            apply_changes(tbl, _batch(spark, [_ins(e + 1, f"c{e}", 0, f"t{e}", e + 1)]), e)
        tbl._snapshot = tbl._read_current_snapshot()
        assert len(tbl._snapshot["buckets"]["0"]) == 6
        tbl.last_read_pruned_files = 0
        got = tbl.lookup("c3").collect()
        assert [r["text"] for r in got] == ["t3"]
        # 5 of the 6 delta files provably never touched c3
        assert tbl.last_read_pruned_files == 5

    def test_lookup_correct_when_digest_overflows(self, spark, tmpdir_path):
        tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=1, mode="mor")
        # >_DIGEST_CAP distinct keys in one file -> digest absent -> never skip
        rows = [_ins(i + 1, f"c{i}", 0, f"t{i}", 1) for i in range(1200)]
        apply_changes(tbl, _batch(spark, rows), 0)
        tbl._snapshot = tbl._read_current_snapshot()
        digests = tbl._snapshot.get("file_key_digests", {})
        assert digests and all(d is None for d in digests.values())
        assert [r["text"] for r in tbl.lookup("c777").collect()] == ["t777"]

    def test_digest_soundness_under_lww(self, spark, tmpdir_path):
        # the pruned read must still produce the LWW winner when the key's
        # history spans several deltas interleaved with untouched ones
        tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=1, mode="mor")
        apply_changes(tbl, _batch(spark, [_ins(1, "hot", 0, "old", 1)]), 0)
        apply_changes(tbl, _batch(spark, [_ins(2, "other", 0, "x", 2)]), 1)
        upd = (3, "update", "hot", 0, "user", "new", None, _t(3))
        apply_changes(tbl, _batch(spark, [upd]), 2)
        apply_changes(tbl, _batch(spark, [_ins(4, "other2", 0, "y", 4)]), 3)
        tbl._snapshot = tbl._read_current_snapshot()
        tbl.last_read_pruned_files = 0
        got = tbl.lookup("hot").collect()
        assert [r["text"] for r in got] == ["new"]
        assert tbl.last_read_pruned_files == 2  # the two untouched deltas


# ---- property: the digest can never produce a FALSE SKIP (soundness) ----
# The digest is built from values pyarrow reads back out of the parquet
# file, but probed with the raw Python value passed to lookup(); this
# property pins that the two canonical forms agree for every value the
# digest claims to support (strings incl. unicode/empty, ints incl.
# negatives), and that unsupported types always yield "never skip".

import pyarrow as pa
import pyarrow.parquet as papq
from hypothesis import given, settings
from hypothesis import strategies as hs

from mas_scada_bulkingest_spark.lake.snapshot_table import (
    _digest_hash,
    _file_key_digest,
)

_keys = hs.lists(
    hs.one_of(
        hs.text(min_size=0, max_size=40),
        hs.integers(min_value=-(2**62), max_value=2**62),
    ),
    min_size=1,
    max_size=200,
)


@settings(max_examples=30, deadline=None)
@given(keys=_keys)
def test_digest_membership_is_sound(keys):
    import tempfile, os

    d = tempfile.mkdtemp(prefix="digest-prop-")
    path = os.path.join(d, "f.parquet")
    # a realistic file mixes types only within arrow's coercion rules;
    # write all keys as strings when any string is present, else ints
    if any(isinstance(k, str) for k in keys):
        vals = [str(k) for k in keys]
        arr = pa.array(vals, pa.string())
    else:
        vals = list(keys)
        arr = pa.array(vals, pa.int64())
    papq.write_table(pa.table({"conv_id": arr}), path)
    digest = _file_key_digest(path, "conv_id")
    if digest is None:
        return  # overflow or unsupported -> never skip -> trivially sound
    slots = {digest[i : i + 4] for i in range(0, len(digest), 4)}
    for v in vals:
        h = _digest_hash(v)
        assert h is not None and f"{h:04x}" in slots, (
            f"digest would FALSE-SKIP a file containing {v!r}"
        )


def test_digest_unsupported_types_never_skip(tmpdir_path):
    import os

    path = os.path.join(tmpdir_path, "f.parquet")
    papq.write_table(
        pa.table({"conv_id": pa.array([1.5, 2.5], pa.float64())}), path
    )
    assert _file_key_digest(path, "conv_id") is None
    assert _digest_hash(1.5) is None and _digest_hash(True) is None
