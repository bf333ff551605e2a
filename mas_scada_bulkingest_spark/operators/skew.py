"""Skew handling: hot-key detection + salted key-partitioned repartition.

The reference has no skew story — uploads are single-threaded
(DBConnector.java:219-332; its thread pool is created but never used,
DBConnector.java:95). At 10^10 change events a hot conversation (Zipf head)
would pin one reducer, so the north_rule demands explicit salted shuffles.

Strategy (per micro-batch, inside ``foreachBatch``):

1. ``hot_keys`` — one cheap aggregate pass over the batch counts events per
   key prefix and keeps keys above a threshold. The batch is already in
   memory/cache for the merge, so this pass is a map-side-combined count,
   not a full re-scan at scale.
2. ``salted_repartition`` — hot keys get a salt in ``[0, n_salts)`` derived
   from a uniformizing hash of non-key columns; cold keys keep salt 0. The
   shuffle key becomes ``(key…, _salt)``, splitting each hot key across
   ``n_salts`` reducers. Downstream two-phase aggregation (see
   ``collapse_lww(two_phase_salt=…)``) unsalts by re-reducing per key.

AQE (``spark.sql.adaptive.skewJoin.enabled``) additionally splits skewed
join/shuffle partitions at runtime; this module is the *explicit* layer the
north_rule asks for, and the engine enables AQE as well (see streaming.driver).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(
    df: DataFrame,
    keys: Sequence[str] = ("conv_id",),
    min_count: int = 100_000,
    sample_fraction: float | None = None,
) -> list[tuple]:
    """Keys whose event count in ``df`` exceeds ``min_count``.

    Returns a (small, driver-side) list of key tuples. The aggregate is
    map-side combined, so its shuffle volume is bounded by the number of
    distinct keys per task.

    ``sample_fraction`` (default: auto) detects hot keys on a uniform sample
    instead of the full batch: a key with ``min_count`` events appears
    ``min_count * fraction`` times in expectation, so the sampled threshold
    keeps ≥ ~50 expected occurrences for any truly hot key — detection stays
    reliable while the scan cost drops by 1/fraction. Pass ``1.0`` to force
    the exact full-batch count. Sampling errs toward *over*-detection
    (threshold set at half the expected sampled count); a false positive only
    costs a harmless extra salt split.
    """
    if sample_fraction is None:
        # keep >= ~50 expected sampled events per genuinely hot key
        sample_fraction = min(1.0, max(0.01, 100.0 / max(min_count, 1)))
    if sample_fraction < 1.0:
        scan = df.sample(fraction=sample_fraction, seed=42)
        threshold = max(1.0, min_count * sample_fraction / 2.0)
    else:
        scan = df
        threshold = float(min_count)
    rows = (
        scan.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > threshold)
        .select(*keys)
        .collect()
    )
    return [tuple(r) for r in rows]


def salted_repartition(
    df: DataFrame,
    keys: Sequence[str] = ("conv_id",),
    n_salts: int = 16,
    hot: list[tuple] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition by ``(keys…, _salt)`` with salting restricted to hot keys.

    ``hot=None`` salts every key (uniform salting); otherwise only the listed
    keys are split. The ``_salt`` column is left on the result so callers can
    run phase-1 aggregation per ``(keys, _salt)`` and then unsalt; drop it
    after the two-phase reduce.
    """
    keys = list(keys)
    salt_source = [c for c in df.columns if c not in keys] or keys
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_source]), F.lit(n_salts))
    if hot is not None:
        if not hot:
            salted = df.withColumn("_salt", F.lit(0))
        else:
            is_hot = F.struct(*[F.col(k) for k in keys]).isin(
                [F.struct(*[F.lit(v) for v in h]) for h in hot]
            )
            salted = df.withColumn("_salt", F.when(is_hot, salt).otherwise(F.lit(0)))
    else:
        salted = df.withColumn("_salt", salt)
    parts = [F.col(k) for k in keys] + [F.col("_salt")]
    if num_partitions:
        return salted.repartition(num_partitions, *parts)
    return salted.repartition(*parts)
