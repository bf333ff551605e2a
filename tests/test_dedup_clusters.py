"""Near-dup clustering: the distributed min-label-propagation connected
components must match a trivially-correct driver-side union-find over the
same verified pair set (and satisfy the structural component invariants)."""

from __future__ import annotations

from mas_scada_bulkingest_spark.queries import (
    q_dedup_clusters,
    q_dedup_minhash_verified,
)

SF_DIR = "/root/testdata/sf0.01"


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_clusters_match_union_find_and_invariants(spark):
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in q_dedup_minhash_verified(spark, SF_DIR)
        .select("doc_a", "doc_b")
        .collect()
    ]
    assert pairs, "fixture must produce verified near-dup pairs"
    expected = _union_find(pairs)

    rows = q_dedup_clusters(spark, SF_DIR).collect()
    got = {r["doc_id"]: r["cluster_id"] for r in rows}
    assert got == expected

    # invariants: every cluster id is its own member and the component min;
    # is_canonical marks exactly one keeper per cluster
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
        assert r["is_canonical"] == (r["doc_id"] == r["cluster_id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)
