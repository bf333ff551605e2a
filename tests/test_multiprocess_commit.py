"""Two separate OS processes (own JVMs) race interleaved merge_changes on
one table — proves the hard-link version CAS where it actually runs
(VERDICT r4 item 4; the in-process suite covers the rebase logic, this
covers the os.link race between real writers)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from race_commit import run_race  # noqa: E402


def test_two_process_commit_race(spark, tmpdir_path):
    report = run_race(spark, tmpdir_path, n_convs=100, n_files=6)
    assert report["ok"]
    assert report["epochs"] == 6
    # both children did real work (neither no-op'd everything)
    assert all(c["applied"] >= 1 for c in report["children"])
