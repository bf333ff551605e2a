"""Multi-table atomic transactions (lake/txn.py).

The reference registers devices AND uploads their rows in one cycle with no
atomicity between the two (Connector.java:136-146); this engine closes that
gap with a presumed-abort two-phase commit over staged (WAP) epochs. These
tests walk the full crash matrix the module docstring promises: pending
crash → nothing visible, decided crash mid-publish → recover() completes,
replay → all no-ops, intervening MoR commit → rebase still atomic.
"""

from __future__ import annotations

import json
import os
from datetime import datetime

import pytest

from mas_scada_bulkingest_spark.lake.snapshot_table import SnapshotTable
from mas_scada_bulkingest_spark.lake.txn import (
    MultiTableTransaction,
    TransactionError,
    recover,
)
from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table

COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)


def _t(s: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0, s)


def _ins(lsn, conv, turn, text, s):
    return (lsn, "insert", conv, turn, "user", text, None, _t(s))


def _batch(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _two_tables(spark, root):
    a = create_transcripts_table(spark, root + "/a", n_buckets=4, mode="mor")
    b = create_transcripts_table(spark, root + "/b", n_buckets=4, mode="mor")
    return a, b


def _stage_pair(spark, a, b, epoch, tag):
    st_a = apply_changes(
        a, _batch(spark, [_ins(10 + epoch, "c1", 0, f"a-{tag}", 1 + epoch)]),
        epoch, stage=True,
    )
    st_b = apply_changes(
        b, _batch(spark, [_ins(10 + epoch, "c1", 0, f"b-{tag}", 1 + epoch)]),
        epoch, stage=True,
    )
    return st_a, st_b


class TestCommit:
    def test_commit_publishes_all_participants(self, spark, tmpdir_path):
        a, b = _two_tables(spark, tmpdir_path)
        log = tmpdir_path + "/txnlog"
        st_a, st_b = _stage_pair(spark, a, b, 0, "e0")
        txn = MultiTableTransaction(log, txn_id="epoch-0")
        txn.enlist(a, st_a.staged_ref)
        txn.enlist(b, st_b.staged_ref)
        stats = txn.commit()
        assert len(stats) == 2 and not any(s.was_noop for s in stats.values())
        assert a.is_epoch_committed(0) and b.is_epoch_committed(0)
        assert a.read().count() == 1 and b.read().count() == 1
        # decision record retired to .done
        assert os.path.exists(log + "/txn-epoch-0.done.json")
        assert not os.path.exists(log + "/txn-epoch-0.json")

    def test_txn_id_is_single_use(self, spark, tmpdir_path):
        a, b = _two_tables(spark, tmpdir_path)
        log = tmpdir_path + "/txnlog"
        st_a, st_b = _stage_pair(spark, a, b, 0, "e0")
        txn = MultiTableTransaction(log, txn_id="dup")
        txn.enlist(a, st_a.staged_ref)
        txn.commit()
        # a second decision under the same id must refuse (create-exclusive)
        os.rename(log + "/txn-dup.done.json", log + "/txn-dup.json")
        txn2 = MultiTableTransaction(log, txn_id="dup")
        txn2.enlist(b, st_b.staged_ref)
        with pytest.raises(TransactionError, match="single-use"):
            txn2.commit()

    def test_replayed_epochs_noop(self, spark, tmpdir_path):
        a, b = _two_tables(spark, tmpdir_path)
        log = tmpdir_path + "/txnlog"
        st_a, st_b = _stage_pair(spark, a, b, 0, "e0")
        txn = MultiTableTransaction(log, txn_id="t1")
        txn.enlist(a, st_a.staged_ref)
        txn.enlist(b, st_b.staged_ref)
        txn.commit()
        va, vb = a.versions()[-1], b.versions()[-1]
        # the upstream replays the whole epoch: exactly-once already bites
        # at the STAGE step (apply_changes' committed-epoch early return),
        # so nothing reaches the transaction at all
        st_a2, st_b2 = _stage_pair(spark, a, b, 0, "e0-replay")
        assert st_a2.was_noop and st_a2.staged_ref is None
        assert st_b2.was_noop and st_b2.staged_ref is None
        assert a.versions()[-1] == va and b.versions()[-1] == vb
        assert a.read().count() == 1 and {r["text"] for r in a.read().collect()} == {"a-e0"}


class TestCrashMatrix:
    def test_pending_crash_presumed_abort(self, spark, tmpdir_path):
        """Crash before the decision record: nothing visible, recover() finds
        nothing, abort() reclaims the stages and the epoch stays replayable."""
        a, b = _two_tables(spark, tmpdir_path)
        log = tmpdir_path + "/txnlog"
        st_a, st_b = _stage_pair(spark, a, b, 0, "e0")
        txn = MultiTableTransaction(log, txn_id="crashed")
        txn.enlist(a, st_a.staged_ref)
        txn.enlist(b, st_b.staged_ref)
        # "crash": commit never called
        assert recover(spark, log) == []
        assert a.read().count() == 0 and b.read().count() == 0
        assert not a.is_epoch_committed(0) and not b.is_epoch_committed(0)
        assert txn.abort() >= 2
        assert a.staged_refs() == [] and b.staged_refs() == []
        # the SAME epoch replays cleanly afterwards
        st_a2, st_b2 = _stage_pair(spark, a, b, 0, "retry")
        txn2 = MultiTableTransaction(log, txn_id="retry")
        txn2.enlist(a, st_a2.staged_ref)
        txn2.enlist(b, st_b2.staged_ref)
        txn2.commit()
        assert {r["text"] for r in a.read().collect()} == {"a-retry"}

    def test_decided_crash_midpublish_recovers(self, spark, tmpdir_path):
        """Crash after the decision + first publish: the second participant
        is completed by recover(), never lost, never double-applied."""
        a, b = _two_tables(spark, tmpdir_path)
        log = tmpdir_path + "/txnlog"
        st_a, st_b = _stage_pair(spark, a, b, 0, "e0")
        txn = MultiTableTransaction(log, txn_id="mid")
        txn.enlist(a, st_a.staged_ref)
        txn.enlist(b, st_b.staged_ref)
        txn._decide()
        a.publish_staged(st_a.staged_ref)  # then "crash"
        assert a.is_epoch_committed(0) and not b.is_epoch_committed(0)
        assert recover(spark, log) == ["mid"]
        b = SnapshotTable(spark, b.path)  # recovery ran "in another process"
        assert b.is_epoch_committed(0)
        assert b.read().count() == 1
        assert os.path.exists(log + "/txn-mid.done.json")
        # recovery is idempotent
        assert recover(spark, log) == []

    def test_decided_crash_before_any_publish_recovers(self, spark, tmpdir_path):
        a, b = _two_tables(spark, tmpdir_path)
        log = tmpdir_path + "/txnlog"
        st_a, st_b = _stage_pair(spark, a, b, 0, "e0")
        txn = MultiTableTransaction(log, txn_id="early")
        txn.enlist(a, st_a.staged_ref)
        txn.enlist(b, st_b.staged_ref)
        txn._decide()  # crash with zero publishes
        assert recover(spark, log) == ["early"]
        a, b = SnapshotTable(spark, a.path), SnapshotTable(spark, b.path)
        assert a.is_epoch_committed(0) and b.is_epoch_committed(0)

    def test_abort_refuses_after_decision(self, spark, tmpdir_path):
        a, b = _two_tables(spark, tmpdir_path)
        log = tmpdir_path + "/txnlog"
        st_a, _ = _stage_pair(spark, a, b, 0, "e0")
        txn = MultiTableTransaction(log, txn_id="noabort")
        txn.enlist(a, st_a.staged_ref)
        txn._decide()
        with pytest.raises(TransactionError, match="cannot abort"):
            txn.abort()

    def test_lost_stage_on_decided_txn_fails_loudly(self, spark, tmpdir_path):
        """A decided manifest whose stage vanished without the epoch
        committing is divergence — recover() must raise, not shrug."""
        a, b = _two_tables(spark, tmpdir_path)
        log = tmpdir_path + "/txnlog"
        st_a, st_b = _stage_pair(spark, a, b, 0, "e0")
        txn = MultiTableTransaction(log, txn_id="lost")
        txn.enlist(a, st_a.staged_ref)
        txn.enlist(b, st_b.staged_ref)
        txn._decide()
        b.abort_staged(st_b.staged_ref)  # simulated operator error
        with pytest.raises(TransactionError, match="re-stage"):
            recover(spark, log)
        # repair path the error message prescribes: re-stage SAME epoch
        st_b2 = apply_changes(
            b, _batch(spark, [_ins(10, "c1", 0, "b-e0", 1)]), 0, stage=True
        )
        assert st_b2.staged_ref
        assert recover(spark, log) == ["lost"]
        b = SnapshotTable(spark, b.path)
        assert b.is_epoch_committed(0)


class TestConcurrency:
    def test_intervening_mor_commit_rebases(self, spark, tmpdir_path):
        """Another writer lands an epoch on participant A between stage and
        publish — the MoR stage rebases and the transaction still commits
        both tables."""
        a, b = _two_tables(spark, tmpdir_path)
        log = tmpdir_path + "/txnlog"
        st_a, st_b = _stage_pair(spark, a, b, 1, "e1")
        # intervening commit on A (different epoch, different key)
        apply_changes(a, _batch(spark, [_ins(50, "c9", 0, "other", 9)]), 99)
        txn = MultiTableTransaction(log, txn_id="rebase")
        txn.enlist(a, st_a.staged_ref)
        txn.enlist(b, st_b.staged_ref)
        stats = txn.commit()
        assert not any(s.was_noop for s in stats.values())
        assert a.is_epoch_committed(1) and a.is_epoch_committed(99)
        texts = {r["text"] for r in a.read().collect()}
        assert texts == {"a-e1", "other"}
        assert {r["text"] for r in b.read().collect()} == {"b-e1"}

    def test_enlist_after_decide_refuses(self, spark, tmpdir_path):
        a, b = _two_tables(spark, tmpdir_path)
        log = tmpdir_path + "/txnlog"
        st_a, st_b = _stage_pair(spark, a, b, 0, "e0")
        txn = MultiTableTransaction(log, txn_id="late")
        txn.enlist(a, st_a.staged_ref)
        txn._decide()
        with pytest.raises(TransactionError, match="enlist after"):
            txn.enlist(b, st_b.staged_ref)


class TestManifestHygiene:
    def test_recover_ignores_tmp_and_done(self, spark, tmpdir_path):
        log = tmpdir_path + "/txnlog"
        os.makedirs(log)
        # stray tmp from a crashed _decide (link succeeded or not — either
        # way the .tmp must never be interpreted as a decision)
        with open(log + "/txn-x.json.tmp-dead", "w") as f:
            json.dump({"txn_id": "x", "participants": []}, f)
        with open(log + "/txn-y.done.json", "w") as f:
            json.dump({"txn_id": "y", "participants": []}, f)
        assert recover(spark, log) == []
