"""Query/operator suite for the driver's correctness harness.

One entry per implemented operator from SURVEY.md §2 (plus the training-data
pipeline operators: dedup, similarity search, text analysis, multimodal
plumbing). Each entry is ``name -> (spark_fn, oracle_sql | None)`` where
``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the equivalent
ANSI SQL DuckDB runs on the same parquet tables.

Determinism contract (the driver value-hashes results): every returned value
is either exact (ints, strings, decimals summed exactly) or the result of a
fixed IEEE-754 double operation on exact inputs (``exact_int / exact_int``,
``sqrt(exact)``), never an order-dependent float reduction. Money-ish doubles
are cast to decimal before summing (the decimal sum is exact and
order-independent), embeddings are snapped to a 1e-4 integer grid before dot
products (integer sums are exact in any order).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.ids import name_uuid_expr
from .operators.classify import classify_expr
from .operators.lww import collapse_lww

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dsum(col: str, scale: int = 2) -> F.Column:
    """Order-independent exact sum of a money-ish double column, as double."""
    return F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double")


#: deterministic ±1 hyperplanes for sign-LSH, derived from md5 so the oracle
#: SQL can embed the identical literals (no RNG — SNIPPETS/PAPERS-style
#: hash-based projection).
def _lsh_planes(n_planes: int = 8, dim: int = 64) -> list[list[int]]:
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane:{p}:{d}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) < 8 else -1)
        planes.append(row)
    return planes


_PLANES = _lsh_planes()

#: snap embedding floats to an exact integer grid (1e-4) so dot products are
#: exact integer sums — order-independent, hence engine-independent.
_GRID = "transform({col}, x -> cast(round(cast(x as double) * 10000) as bigint))"


def _duck_grid(col: str) -> str:
    return f"list_transform({col}, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))"


# part-type classification config (exercises F12 first-match-wins + P5 discard)
_CLASSIFY_PATTERNS = [
    ("economy", ".*ECONOMY.*"),
    ("polished", ".*POLISHED.*"),
    ("brushed", ".*BRUSHED.*"),
    ("anodized", ".*ANODIZED.*"),
]
_CLASSIFY_DISCARD = [".*NICKEL.*"]


def _classify_case_sql(col: str) -> str:
    """DuckDB CASE mirroring classify_expr (anchored full match + discard)."""
    discard = " OR ".join(
        f"regexp_full_match({col}, '^(?:{d})$')" for d in _CLASSIFY_DISCARD
    )
    whens = "\n        ".join(
        f"WHEN regexp_full_match({col}, '^(?:{p})$') AND NOT ({discard}) THEN '{t}'"
        for t, p in _CLASSIFY_PATTERNS
    )
    return f"CASE {whens} ELSE 'other' END"


_VARIANT_CASE = (
    "CASE WHEN substring(h,17,1) IN ('0','4','8','c') THEN '8' "
    "WHEN substring(h,17,1) IN ('1','5','9','d') THEN '9' "
    "WHEN substring(h,17,1) IN ('2','6','a','e') THEN 'a' "
    "ELSE 'b' END"
)

# ---------------------------------------------------------------------------
# S1/P1 — windowed incremental scan (reference deviceSqlTemplate.sql:1-3)
# ---------------------------------------------------------------------------


def q_windowed_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp_ntz"))
            & (F.col("ts") < F.lit("2024-01-12 00:00:00").cast("timestamp_ntz"))
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("value").alias("value"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        )
    )


_SQL_WINDOWED_SCAN = """
SELECT event_id, user_id, event_type, value,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
"""

# ---------------------------------------------------------------------------
# W1 — last-writer-wins collapse (north_rule core operator)
# ---------------------------------------------------------------------------


def q_lww_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id", "value")
    out = collapse_lww(ev, keys=("user_id", "event_type"), order=("ts", "event_id"))
    return out.select(
        "user_id",
        "event_type",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )


_SQL_LWW_LATEST = """
SELECT user_id, event_type, event_id AS last_event_id, value AS last_value,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""

# ---------------------------------------------------------------------------
# J1 — fact × broadcast dim equi join (reference deviceSqlTemplate.sql:2)
# ---------------------------------------------------------------------------


def q_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dsum("l_extendedprice").alias("revenue"),
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
             / F.count(F.lit(1)).cast("double")).alias("avg_qty"),
        )
    )


_SQL_BROADCAST_ENRICH = """
SELECT p_brand,
       count(*) AS n_items,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""

# ---------------------------------------------------------------------------
# J2 — EAV pivot via conditional aggregation (reference alarmSqlTemplate.sql:8-12)
# ---------------------------------------------------------------------------


def q_eav_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def piv(etype: str) -> F.Column:
        return F.coalesce(
            F.sum(
                F.when(F.col("event_type") == etype, F.col("value")).cast("decimal(18,4)")
            ).cast("double"),
            F.lit(0.0),
        )

    return ev.groupBy("user_id").agg(
        piv("click").alias("click_value"),
        piv("view").alias("view_value"),
        piv("purchase").alias("purchase_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


_SQL_EAV_PIVOT = """
SELECT user_id,
  coalesce(CAST(sum(CAST(CASE WHEN event_type='click' THEN value END AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS click_value,
  coalesce(CAST(sum(CAST(CASE WHEN event_type='view' THEN value END AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS view_value,
  coalesce(CAST(sum(CAST(CASE WHEN event_type='purchase' THEN value END AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS purchase_value,
  count(*) AS n_events
FROM events GROUP BY user_id
"""

# ---------------------------------------------------------------------------
# F12/P5 — first-match-wins regex classification with discard patterns
# ---------------------------------------------------------------------------


def q_classify_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    cls = classify_expr(
        "p_type", _CLASSIFY_PATTERNS, discard=_CLASSIFY_DISCARD, default_type="other"
    )
    return (
        part.withColumn("part_class", cls)
        .groupBy("part_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            _dsum("p_retailprice").alias("total_price"),
        )
    )


_SQL_CLASSIFY_REGEX = f"""
SELECT {_classify_case_sql('p_type')} AS part_class,
       count(*) AS n_parts,
       CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM part
GROUP BY 1
"""

# ---------------------------------------------------------------------------
# J3/F5/A3 — entity registry: first-seen discovery + deterministic UUIDv3
# ---------------------------------------------------------------------------


def q_entity_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    reg = ev.groupBy("user_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_seen"),
        F.count(F.lit(1)).alias("n_events"),
        F.max("event_id").alias("max_event_id"),
    )
    name = F.concat(F.lit("user:"), F.col("user_id").cast("string"))
    return reg.withColumn("entity_uuid", name_uuid_expr(name))


_SQL_ENTITY_REGISTRY = f"""
WITH reg AS (
  SELECT user_id,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,
         count(*) AS n_events,
         max(event_id) AS max_event_id
  FROM events GROUP BY user_id
), h AS (
  SELECT *, md5('user:' || CAST(user_id AS VARCHAR)) AS h FROM reg
)
SELECT user_id, first_seen, n_events, max_event_id,
       substring(h,1,8) || '-' || substring(h,9,4) || '-3' || substring(h,14,3)
       || '-' || {_VARIANT_CASE} || substring(h,18,3) || '-' || substring(h,21,12)
       AS entity_uuid
FROM h
"""

# ---------------------------------------------------------------------------
# F4 — positional explode of path segments (reference Dimension.java:142-148)
# ---------------------------------------------------------------------------


def q_dim_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.posexplode(F.split(F.col("p_type"), " ")).alias("seg_pos", "segment"),
    ).select("p_partkey", (F.col("seg_pos") + 1).alias("seg_pos"), "segment")


_SQL_DIM_EXPLODE = """
SELECT p_partkey,
       generate_subscripts(string_split(p_type, ' '), 1) AS seg_pos,
       unnest(string_split(p_type, ' ')) AS segment
FROM part
"""

# ---------------------------------------------------------------------------
# F10 — regex extraction from a packed source string (alarmSqlTemplate.sql:4)
# here: JSON-ish props parsing (the engine's from_json analog, kept
# regex-based so the oracle needs no JSON extension)
# ---------------------------------------------------------------------------


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'"k": (\d+)', 1).cast("int")
    return (
        ev.withColumn("k", k)
        .withColumn("k_bucket", F.floor(F.col("k") / F.lit(10)).cast("int"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            _dsum("value", 4).alias("sum_value"),
        )
    )


_SQL_JSON_EXTRACT = """
SELECT CAST(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) // 10 AS INT) AS k_bucket,
       count(*) AS n,
       CAST(sum(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT)) AS BIGINT) AS sum_k,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1
"""

# ---------------------------------------------------------------------------
# F6/F7/F8 — calendar decomposition rollup (reference DateUtil.java:44-81)
# ---------------------------------------------------------------------------


def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum("o_totalprice").alias("total"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


_SQL_TIME_ROLLUP = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year, CAST(month(o_orderdate) AS INT) AS o_month,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
       count(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# F6/F7 — epoch-millis → timestamp → formatted string roundtrip (reference
# `new Timestamp(rs.getLong(i))`, DBConnector.java:434-436 + SimpleDateFormat
# both directions, DateUtil.java:44-81). Timezone-independent by construction:
# all arithmetic happens in TIMESTAMP_NTZ space.
# ---------------------------------------------------------------------------


def q_epoch_millis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ms = F.col("event_id") * F.lit(1000003) + F.pmod(F.col("event_id"), F.lit(997))
    return (
        ev.withColumn("ms", ms)
        .withColumn(
            "t_ms",
            F.expr("timestampadd(MILLISECOND, ms, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
        )
        .select(
            "event_id",
            "ms",
            F.date_format("t_ms", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts_ms_str"),
            (
                F.expr(
                    "timestampdiff(MILLISECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', t_ms)"
                )
                == F.col("ms")
            ).alias("roundtrip_ok"),
        )
    )


_SQL_EPOCH_MILLIS = """
WITH m AS (
  SELECT event_id, event_id * 1000003 + event_id % 997 AS ms FROM events
)
SELECT event_id, ms,
       strftime(TIMESTAMP '1970-01-01 00:00:00' + to_microseconds(ms * 1000),
                '%Y-%m-%d %H:%M:%S.%g') AS ts_ms_str,
       true AS roundtrip_ok
FROM m
"""

# ---------------------------------------------------------------------------
# A1 — pricing summary (TPC-H Q1 shape; partial-agg hash aggregate)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    charge = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * (F.lit(1.0) + F.col("l_tax"))
    ).cast("decimal(18,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

# ---------------------------------------------------------------------------
# O1 — deterministic top-k
# ---------------------------------------------------------------------------


def q_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    tot = o.groupBy("o_custkey").agg(_dsum("o_totalprice").alias("total_spent"))
    return (
        tot.join(F.broadcast(c), tot.o_custkey == c.c_custkey)
        .select(F.col("c_custkey").alias("custkey"), "c_name", "total_spent")
        .orderBy(F.desc("total_spent"), F.asc("custkey"))
        .limit(10)
    )


_SQL_TOPK_CUSTOMERS = """
SELECT c_custkey AS custkey, c_name,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, custkey ASC
LIMIT 10
"""

# ---------------------------------------------------------------------------
# set op — unionByName of heterogeneous entity tables
# ---------------------------------------------------------------------------


def q_union_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    n = _t(spark, sf_dir, "nation")
    return (
        c.unionByName(s)
        .join(F.broadcast(n), F.col("nationkey") == n.n_nationkey)
        .groupBy("kind", "n_name")
        .agg(F.count(F.lit(1)).alias("n_entities"), _dsum("acctbal").alias("sum_acctbal"))
    )


_SQL_UNION_ENTITIES = """
WITH u AS (
  SELECT c_name AS name, c_nationkey AS nationkey, c_acctbal AS acctbal, 'customer' AS kind FROM customer
  UNION ALL
  SELECT s_name, s_nationkey, s_acctbal, 'supplier' FROM supplier
)
SELECT kind, n_name, count(*) AS n_entities,
       CAST(sum(CAST(acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM u JOIN nation ON nationkey = n_nationkey
GROUP BY kind, n_name
"""

# ---------------------------------------------------------------------------
# anti/semi join — new-entity detection (reference cache-miss path J3)
# ---------------------------------------------------------------------------


def q_anti_new_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(
            F.col("c_custkey").alias("custkey"),
            "c_name",
            F.col("c_mktsegment").alias("mktsegment"),
        )
    )


_SQL_ANTI_NEW_ENTITIES = """
SELECT c_custkey AS custkey, c_name, c_mktsegment AS mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""

# ---------------------------------------------------------------------------
# dedup: exact (hash-groupBy over content fingerprint)
# ---------------------------------------------------------------------------

_NORM = "regexp_replace(trim(lower({c})), '\\\\s+', ' ')"


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "))
    return (
        d.withColumn("fp", fp)
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .groupBy("n_copies")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.min("keep_doc_id").alias("min_keep_doc_id"),
        )
    )


_SQL_DEDUP_EXACT = f"""
WITH g AS (
  SELECT md5({_NORM.format(c='text')}) AS fp,
         min(doc_id) AS keep_doc_id, count(*) AS n_copies
  FROM documents GROUP BY 1
)
SELECT n_copies, count(*) AS n_groups, min(keep_doc_id) AS min_keep_doc_id
FROM g GROUP BY n_copies
"""

# ---------------------------------------------------------------------------
# dedup: n-gram Jaccard near-dup pairs (shingle → self-join → ratio)
# ---------------------------------------------------------------------------

_SHINGLE_EXPR = (
    "transform(sequence(0, size(_toks) - 3), "
    "i -> concat_ws(' ', _toks[i], _toks[i+1], _toks[i+2]))"
)


def _shingles(d: DataFrame) -> DataFrame:
    """doc_id → exploded distinct word-3-gram shingles."""
    toks = F.split(F.trim(F.col("text")), " ")
    return (
        d.select("doc_id", toks.alias("_toks"))
        .filter(F.size("_toks") >= 3)
        .select("doc_id", F.explode(F.expr(_SHINGLE_EXPR)).alias("shingle"))
        .distinct()
    )


_SQL_SHINGLES = """
  toks AS (
    SELECT doc_id,
           unnest(string_split(trim(text), ' ')) AS tok,
           generate_subscripts(string_split(trim(text), ' '), 1) AS pos
    FROM documents
  ),
  shingles AS (
    SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
    FROM toks a
    JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  )
"""


#: document-frequency cap: shingles shared by more than this many documents
#: are "stop shingles" and are dropped BEFORE the self-join. Without it one
#: common 3-gram shared by k docs makes k² join rows — quadratic blowup on a
#: real corpus (the 100 TB scale-killer). Jaccard is then computed over the
#: filtered shingle sets on both engine and oracle, so results stay exact.
_SHINGLE_DF_CAP = 50


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    raw_sh = _shingles(d)
    # Document frequency via an unordered window count: ONE hash exchange of
    # the shingle set (vs a groupBy+self-join formulation, which recomputes
    # the shingle derivation for each branch), and it leaves the data
    # hash-partitioned on `shingle` — exactly the partitioning the pair
    # self-join below needs, so Catalyst plans no further exchange for it.
    w_df = Window.partitionBy("shingle")
    sh = (
        raw_sh.withColumn("_df", F.count(F.lit(1)).over(w_df))
        .filter(F.col("_df") <= _SHINGLE_DF_CAP)
        .select("doc_id", "shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = (
        F.col("n_inter").cast("double")
        / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.2)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
    )


_SQL_DEDUP_NGRAM_JACCARD = f"""
WITH {_SQL_SHINGLES},
  kept AS (
    SELECT s.doc_id, s.shingle
    FROM shingles s
    JOIN (SELECT shingle FROM shingles GROUP BY shingle
          HAVING count(*) <= {_SHINGLE_DF_CAP}) k USING (shingle)
  ),
  sizes AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
  inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
    FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  )
SELECT doc_a, doc_b, n_inter,
       CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.2
"""

# ---------------------------------------------------------------------------
# dedup: MinHash + LSH banding (shingle → minhash sig → band → bucket join)
# ---------------------------------------------------------------------------

_N_HASHES = 8
_BAND_R = 2  # rows per band -> 4 bands

#: band-bucket cap: an LSH bucket holding more than this many documents
#: (boilerplate / near-empty docs sharing a band signature — guaranteed in a
#: real 100 TB corpus) would emit k² candidate pairs from the band self-join,
#: the same quadratic blowup the shingle path caps with ``_SHINGLE_DF_CAP``.
#: Oversized buckets are dropped BEFORE the join, mirrored in the oracle.
_BAND_BUCKET_CAP = 20


def _doc_shingle_sets(d: DataFrame) -> DataFrame:
    """doc_id → distinct shingle set as ONE array row per document.

    The single shared shingle derivation for the whole MinHash pipeline:
    minhash signatures are computed from the array with pure column
    transforms (no per-(doc, hash) explode + re-aggregate), and the
    exact-Jaccard verify stage intersects the same arrays — candidates,
    set sizes, and intersections all hang off this one subtree. Its
    ``groupBy(doc_id)`` exchange (and the distinct exchange inside
    ``_shingles``) is byte-identical in every branch that references it, so
    Spark's exchange reuse computes the expensive tokenize→explode→distinct
    chain once per query instead of once per branch.
    """
    return _shingles(d).groupBy("doc_id").agg(
        F.collect_set("shingle").alias("shset")
    )


def _band_signatures(docsh: DataFrame) -> DataFrame:
    """doc_id → one (band, bandkey) row per band, derived entirely map-side
    from the shingle-set array: ``sig_j = min over shingles of
    md5(j:shingle)`` via an array transform — zero shuffles past the
    shingle-set aggregate (the previous formulation exploded 8 hash rows per
    shingle through two more groupBys)."""
    def _hash_fn(j: int):
        prefix = f"{j}:"
        # single-arg lambda on purpose: F.transform treats a 2-arg callable
        # as (element, index) and would rebind a default-arg j to the index
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    sigs = [
        F.array_min(F.transform(F.col("shset"), _hash_fn(j))).alias(f"_sig{j}")
        for j in range(_N_HASHES)
    ]
    wide = docsh.select("doc_id", *sigs)
    band_structs = []
    for bnd in range(_N_HASHES // _BAND_R):
        parts = [
            F.concat(F.lit(f"{j}:"), F.col(f"_sig{j}"))
            for j in range(bnd * _BAND_R, (bnd + 1) * _BAND_R)
        ]
        band_structs.append(
            F.struct(
                F.lit(bnd).cast("int").alias("band"),
                F.concat_ws("|", *parts).alias("bandkey"),
            )
        )
    return wide.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("_bb")
    ).select("doc_id", F.col("_bb.band").alias("band"), F.col("_bb.bandkey").alias("bandkey"))


def _capped_band_pairs(docsh: DataFrame) -> DataFrame:
    """Candidate pairs from size-capped LSH buckets. The cap's window count
    leaves the data hash-partitioned on (band, bandkey) — exactly the
    self-join key — so Catalyst plans no further exchange for the join, and
    no bucket can contribute more than ``_BAND_BUCKET_CAP²/2`` pairs."""
    from pyspark.sql import Window

    bandsig = _band_signatures(docsh)
    w = Window.partitionBy("band", "bandkey")
    kept = (
        bandsig.withColumn("_bs", F.count(F.lit(1)).over(w))
        .filter(F.col("_bs") <= _BAND_BUCKET_CAP)
        .select("doc_id", "band", "bandkey")
    )
    a = kept.alias("a")
    b = kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bandkey") == F.col("b.bandkey")),
        )
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.band").alias("band"),
        )
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return _capped_band_pairs(_doc_shingle_sets(d)).distinct()


#: shared oracle CTE chain: shingles → minhash sigs → band keys → capped
#: buckets (mirror of ``_band_signatures`` + ``_capped_band_pairs``).
_SQL_BANDSIG_KEPT = f"""
  hashed AS (
    SELECT doc_id, j, md5(CAST(j AS VARCHAR) || ':' || shingle) AS h
    FROM shingles, (SELECT unnest(range(0, {_N_HASHES})) AS j)
  ),
  sig AS (SELECT doc_id, j, min(h) AS minhash FROM hashed GROUP BY doc_id, j),
  bandsig AS (
    SELECT doc_id, CAST(j // {_BAND_R} AS INT) AS band,
           string_agg(CAST(j AS VARCHAR) || ':' || minhash, '|' ORDER BY j) AS bandkey
    FROM sig GROUP BY 1, 2
  ),
  kept AS (
    SELECT doc_id, band, bandkey FROM (
      SELECT *, count(*) OVER (PARTITION BY band, bandkey) AS _bs FROM bandsig
    ) WHERE _bs <= {_BAND_BUCKET_CAP}
  )
"""

_SQL_DEDUP_MINHASH_LSH = f"""
WITH {_SQL_SHINGLES},
{_SQL_BANDSIG_KEPT}
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.band AS band
FROM kept a JOIN kept b ON a.band = b.band AND a.bandkey = b.bandkey
WHERE a.doc_id < b.doc_id
"""

# ---------------------------------------------------------------------------
# dedup: MinHash-LSH with exact-Jaccard refinement — the full two-stage
# near-dup pipeline. Stage 1 (recall): banded minhash buckets propose
# candidate pairs (never all-pairs). Stage 2 (precision): the TRUE Jaccard
# is computed for candidates only — the exact check's cost is bounded by the
# candidate count, which is what makes exact verification affordable at
# 100 TB (the verification join keys on (pair, shingle), both sides pruned
# to candidate docs first).
# ---------------------------------------------------------------------------

_LSH_VERIFY_THRESHOLD = 0.2


def q_dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    docsh = _doc_shingle_sets(d)
    cand = _capped_band_pairs(docsh).select("doc_a", "doc_b").distinct()
    # Exact verification straight off the shared shingle-set arrays: joining
    # candidates to docsh prunes to candidate docs implicitly (inner join on
    # doc id), and the intersection is a per-row array op — no (pair,
    # shingle) blow-up join, and the exact check's cost stays bounded by the
    # candidate count (which the band-bucket cap bounds in turn).
    left = docsh.select(F.col("doc_id").alias("doc_a"), F.col("shset").alias("_sa"))
    right = docsh.select(F.col("doc_id").alias("doc_b"), F.col("shset").alias("_sb"))
    res = (
        cand.join(left, "doc_a")
        .join(right, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("_sa", "_sb")).cast("long").alias("n_inter"),
            F.size("_sa").cast("long").alias("_na"),
            F.size("_sb").cast("long").alias("_nb"),
        )
    )
    jac = (
        F.col("n_inter").cast("double")
        / (F.col("_na") + F.col("_nb") - F.col("n_inter")).cast("double")
    )
    return (
        res.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= _LSH_VERIFY_THRESHOLD)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
    )


def _minhash_verified_sql() -> str:
    return f"""
WITH {_SQL_SHINGLES},
{_SQL_BANDSIG_KEPT},
  cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM kept a JOIN kept b ON a.band = b.band AND a.bandkey = b.bandkey
    WHERE a.doc_id < b.doc_id
  ),
  sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
  inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_inter
    FROM cand c
    JOIN shingles sa ON sa.doc_id = c.doc_a
    JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
    GROUP BY 1, 2
  )
SELECT doc_a, doc_b, n_inter,
       CAST(n_inter AS DOUBLE) / CAST(za.n_sh + zb.n_sh - n_inter AS DOUBLE) AS jaccard
FROM inter
JOIN sizes za ON za.doc_id = doc_a
JOIN sizes zb ON zb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / CAST(za.n_sh + zb.n_sh - n_inter AS DOUBLE)
      >= {_LSH_VERIFY_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# dedup: near-dup CLUSTERING — connected components over the verified pairs
# (the final stage of a real dedup pipeline: each component keeps ONE
# canonical document; pairs alone over-delete when A~B and B~C but A!~C).
# ---------------------------------------------------------------------------

#: iteration cap for min-label propagation — each round halves the distance
#: a component's min label still has to travel, so this bounds component
#: diameter at 2^k-ish; near-dup graphs are shallow (dense cliques + short
#: chains). The loop exits early on convergence.
_CC_MAX_ITERS = 20


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via iterative min-label propagation: every doc
    starts labeled with itself; each round takes the min label over itself
    and its neighbors; at fixpoint every member of a component carries the
    component's min doc_id (→ ``cluster_id``; the canonical keeper is the
    row with ``doc_id == cluster_id``).

    Scale notes (100 TB): each round is one equi-join on doc id + one
    map-side-combined min aggregate — both shuffle O(edges) hash-partitioned
    on doc id, never materializing components as rows (the recursive-CTE
    closure the oracle runs would be O(sum of component²) — fine for an
    oracle, wrong for an engine). ``localCheckpoint`` truncates the plan per
    round so the lineage doesn't grow with iterations; convergence is
    detected with a bounded ``limit(1).count`` probe. For graphs with
    continent-sized diameters use the alternating large-star/small-star
    variant (Kiveris et al., "Connected Components in MapReduce"); near-dup
    graphs never need it.
    """
    # checkpoint the verified pairs BEFORE the symmetric union: the union's
    # two branches would otherwise each re-run the whole minhash+verify
    # pipeline (measured 10.6 s vs 3.5 s for one materialization)
    pairs = (
        q_dedup_minhash_verified(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    labels = (
        edges.select(F.col("doc_a").alias("doc"))
        .distinct()
        .withColumn("lbl", F.col("doc"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(_CC_MAX_ITERS):
        # min label among neighbors …
        nbr_min = (
            edges.join(labels, edges["doc_b"] == labels["doc"])
            .groupBy(edges["doc_a"].alias("doc"))
            .agg(F.min("lbl").alias("_nbr"))
        )
        # … plus pointer jumping (my label's own label) — doubles the
        # distance a component's min travels per round, so rounds ≈
        # log2(diameter) instead of diameter
        parent = labels.select(
            F.col("doc").alias("_pdoc"), F.col("lbl").alias("_plbl")
        )
        best = F.least(
            F.col("lbl"),
            F.coalesce(F.col("_nbr"), F.col("lbl")),
            F.coalesce(F.col("_plbl"), F.col("lbl")),
        )
        # ONE action per round: the checkpoint materializes the new labels
        # (and truncates lineage); the convergence probe then reads the
        # materialized blocks instead of re-running the round's joins
        new_labels = (
            labels.join(nbr_min, "doc", "left")
            .join(parent, labels["lbl"] == F.col("_pdoc"), "left")
            .select(
                "doc",
                best.alias("_new"),
                (best < F.col("lbl")).alias("_changed"),
            )
            .select("doc", F.col("_new").alias("lbl"), "_changed")
            .localCheckpoint()
        )
        labels = new_labels.select("doc", "lbl")
        if new_labels.filter("_changed").limit(1).count() == 0:
            converged = True
            break
    if not converged:
        # labels still moving at the cap → cluster_ids would be WRONG
        # (split components). Fail loudly rather than return silently-bad
        # data; a graph this deep needs the large-star/small-star variant.
        raise RuntimeError(
            f"q_dedup_clusters: label propagation did not converge within "
            f"{_CC_MAX_ITERS} pointer-jumping rounds (component diameter "
            f"> ~2^{_CC_MAX_ITERS}); returned labels would split components."
        )
    return labels.select(
        F.col("doc").alias("doc_id"),
        F.col("lbl").alias("cluster_id"),
        (F.col("doc") == F.col("lbl")).alias("is_canonical"),
    )


def _dedup_clusters_sql() -> str:
    """Oracle: transitive closure by recursive CTE (reach(doc, lbl) = label
    lbl reaches doc), then min label per doc — the fixpoint is unique, so
    the iterative engine and the closure-based oracle must agree exactly."""
    verified = _minhash_verified_sql()
    return f"""
WITH RECURSIVE
  vpairs AS ({verified}),
  edges AS (
    SELECT doc_a AS u, doc_b AS v FROM vpairs
    UNION
    SELECT doc_b, doc_a FROM vpairs
  ),
  verts AS (SELECT DISTINCT u AS doc FROM edges),
  reach(doc, lbl) AS (
    SELECT doc, doc FROM verts
    UNION
    SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.doc
  )
SELECT doc AS doc_id,
       min(lbl) AS cluster_id,
       (doc = min(lbl)) AS is_canonical
FROM reach GROUP BY doc
"""


# ---------------------------------------------------------------------------
# dedup: SimHash fingerprint (16-bit, md5-digit high-bit variant)
# ---------------------------------------------------------------------------


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    ).withColumn("h", F.md5("tok"))
    bit_cols = [
        F.sum(
            F.when(F.substring("h", i + 1, 1) >= "8", F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"_b{i}")
        for i in range(16)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_cols)
    sim = None
    for i in range(16):
        term = F.when(F.col(f"_b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    per_doc = agg.select("doc_id", sim.alias("simhash"))
    return per_doc.groupBy("simhash").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id")
    )


def _simhash_sql() -> str:
    bits = ",\n      ".join(
        f"sum(CASE WHEN substring(h,{i+1},1) >= '8' THEN 1 ELSE -1 END) AS _b{i}"
        for i in range(16)
    )
    simexpr = " + ".join(f"CASE WHEN _b{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(16))
    return f"""
WITH toks AS (
  SELECT doc_id, md5(unnest(string_split(trim(text), ' '))) AS h FROM documents
), agg AS (
  SELECT doc_id,
      {bits}
  FROM toks GROUP BY doc_id
), per_doc AS (
  SELECT doc_id, {simexpr} AS simhash FROM agg
)
SELECT simhash, count(*) AS n_docs, min(doc_id) AS min_doc_id
FROM per_doc GROUP BY simhash
"""


# ---------------------------------------------------------------------------
# similarity search: brute-force cosine top-k (exact-integer-grid arithmetic)
# ---------------------------------------------------------------------------


def q_embed_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_GRID.format(col="embedding")).alias("g")
    )
    norm = emb.withColumn(
        "n2", F.expr("aggregate(g, cast(0 as bigint), (acc, x) -> acc + x * x)")
    )
    q = norm.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("g").alias("qg"), F.col("n2").alias("qn2")
    )
    pairs = q.join(
        norm.select(F.col("vec_id").alias("cand_id"), F.col("g").alias("cg"), F.col("n2").alias("cn2")),
        F.col("query_id") != F.col("cand_id"),
    )
    dot = F.expr("aggregate(zip_with(qg, cg, (x, y) -> x * y), cast(0 as bigint), (acc, x) -> acc + x)")
    cos = dot.cast("double") / (F.sqrt(F.col("qn2").cast("double")) * F.sqrt(F.col("cn2").cast("double")))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        pairs.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "cand_id", "rank", "cosine")
    )


_SQL_EMBED_COSINE_TOPK = f"""
WITH g AS (
  SELECT vec_id, {_duck_grid('embedding')} AS g FROM embeddings
), n AS (
  SELECT vec_id, g, list_sum(list_transform(g, x -> x * x)) AS n2 FROM g
), pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         CAST(list_sum(list_transform(range(1, 65), i -> q.g[i] * c.g[i])) AS DOUBLE)
           / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS cosine
  FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank
  FROM pairs
)
SELECT query_id, cand_id, rank, cosine FROM ranked WHERE rank <= 5
"""

# ---------------------------------------------------------------------------
# similarity search: sign-LSH bucketing (hash-derived hyperplanes; the scale
# path for ANN — bucket first, then search within bucket)
# ---------------------------------------------------------------------------


def _lsh_bucket_col() -> F.Column:
    """Integer sign-LSH bucket id from the grid column ``g`` (8 md5-derived
    hyperplanes — deterministic, no RNG, exact integer dot products)."""
    bucket = None
    for p, plane in enumerate(_PLANES):
        arr = "array(" + ",".join(f"cast({w} as bigint)" for w in plane) + ")"
        dot = F.expr(
            f"aggregate(zip_with(g, {arr}, (x, w) -> x * w), cast(0 as bigint), (acc, x) -> acc + x)"
        )
        term = F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return bucket


def _duck_lsh_bucket() -> str:
    terms = []
    for p, plane in enumerate(_PLANES):
        arr = "[" + ",".join(str(w) for w in plane) + "]"
        terms.append(
            f"CASE WHEN list_sum(list_transform(range(1, 65), i -> g[i] * ({arr})[i])) > 0 "
            f"THEN {1 << p} ELSE 0 END"
        )
    return " + ".join(terms)


def q_embed_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.expr(_GRID.format(col="embedding")).alias("g")
    )
    return (
        emb.withColumn("bucket", _lsh_bucket_col())
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("vec_id").alias("min_vec_id"),
            F.countDistinct("label").alias("n_labels"),
        )
    )


def _ann_lsh_sql() -> str:
    return f"""
WITH g AS (
  SELECT vec_id, label, {_duck_grid('embedding')} AS g FROM embeddings
), b AS (
  SELECT vec_id, label, {_duck_lsh_bucket()} AS bucket FROM g
)
SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec_id,
       count(DISTINCT label) AS n_labels
FROM b GROUP BY bucket
"""


# ---------------------------------------------------------------------------
# similarity search: actual ANN query — MULTI-TABLE LSH bucket join +
# within-candidate cosine top-k. The 100 TB shape: each vector explodes into
# L (table, bucket) keys; candidates are the union over tables of
# same-bucket vectors (an equi join on (table, bucket) — hash-partitionable,
# never all-pairs); a distinct pass dedupes pairs that collide in several
# tables, then cosine ranks per query. L tables × k bits is the standard
# recall lever (recall@5 and the candidate fraction vs the exact baseline
# q_embed_cosine_topk are reported in BENCH.md — the test embeddings are
# near-random, which bounds any ANN method's recall/candidate tradeoff).
# ---------------------------------------------------------------------------

_ANN_TABLES = 8
_ANN_BITS = 6
_PLANES_MT = _lsh_planes(n_planes=_ANN_TABLES * _ANN_BITS)


def _mt_bucket_cols() -> list[F.Column]:
    """Per-table integer bucket ids (table t uses planes [t*k, (t+1)*k))."""
    out = []
    for t in range(_ANN_TABLES):
        bucket = None
        for b in range(_ANN_BITS):
            plane = _PLANES_MT[t * _ANN_BITS + b]
            arr = "array(" + ",".join(f"cast({w} as bigint)" for w in plane) + ")"
            dot = F.expr(
                f"aggregate(zip_with(g, {arr}, (x, w) -> x * w), "
                "cast(0 as bigint), (acc, x) -> acc + x)"
            )
            term = F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
            bucket = term if bucket is None else bucket + term
        out.append(bucket)
    return out


def q_embed_ann_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_GRID.format(col="embedding")).alias("g")
    )
    norm = emb.withColumn(
        "n2", F.expr("aggregate(g, cast(0 as bigint), (acc, x) -> acc + x * x)")
    )
    buckets = _mt_bucket_cols()
    keys = norm.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), b.alias("bucket"))
                    for t, b in enumerate(buckets)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    qk = keys.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "tbl", "bucket"
    )
    ck = keys.select(F.col("vec_id").alias("cand_id"), "tbl", "bucket")
    cand_pairs = (
        qk.join(ck, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    qv = norm.select(
        F.col("vec_id").alias("query_id"), F.col("g").alias("qg"), F.col("n2").alias("qn2")
    )
    cv = norm.select(
        F.col("vec_id").alias("cand_id"), F.col("g").alias("cg"), F.col("n2").alias("cn2")
    )
    pairs = cand_pairs.join(F.broadcast(qv), "query_id").join(cv, "cand_id")
    dot = F.expr(
        "aggregate(zip_with(qg, cg, (x, y) -> x * y), cast(0 as bigint), (acc, x) -> acc + x)"
    )
    cos = dot.cast("double") / (
        F.sqrt(F.col("qn2").cast("double")) * F.sqrt(F.col("cn2").cast("double"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        pairs.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "cand_id", "rank", "cosine")
    )


def _duck_mt_bucket(t: int) -> str:
    terms = []
    for b in range(_ANN_BITS):
        plane = _PLANES_MT[t * _ANN_BITS + b]
        arr = "[" + ",".join(str(w) for w in plane) + "]"
        terms.append(
            f"CASE WHEN list_sum(list_transform(range(1, 65), i -> g[i] * ({arr})[i])) > 0 "
            f"THEN {1 << b} ELSE 0 END"
        )
    return " + ".join(terms)


def _ann_search_sql() -> str:
    per_table = "\nUNION ALL\n".join(
        f"SELECT vec_id, {t} AS tbl, {_duck_mt_bucket(t)} AS bucket FROM g"
        for t in range(_ANN_TABLES)
    )
    return f"""
WITH g AS (
  SELECT vec_id, {_duck_grid('embedding')} AS g FROM embeddings
), n AS (
  SELECT vec_id, g, list_sum(list_transform(g, x -> x * x)) AS n2 FROM g
), keys AS (
  {per_table}
), cand_pairs AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
  FROM keys q JOIN keys c ON q.tbl = c.tbl AND q.bucket = c.bucket
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
), pairs AS (
  SELECT p.query_id, p.cand_id,
         CAST(list_sum(list_transform(range(1, 65), i -> q.g[i] * c.g[i])) AS DOUBLE)
           / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS cosine
  FROM cand_pairs p
  JOIN n q ON q.vec_id = p.query_id
  JOIN n c ON c.vec_id = p.cand_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank
  FROM pairs
)
SELECT query_id, cand_id, rank, cosine FROM ranked WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# similarity search: IVF (inverted-file) ANN — the other scale path besides
# LSH. Vectors are assigned to the cell of their nearest centroid (one
# broadcast join against the small centroid set — at 100 TB this is the
# classic partition-the-corpus-by-cell layout); a query probes its nprobe
# nearest cells and ranks only those cells' members. Centroids are k-means-
# TRAINED (fixed-iteration Lloyd, seeded deterministically from vec_id < K)
# with a trick that keeps the DuckDB oracle bit-exact: cosine is scale-
# invariant, so each centroid is represented by the per-dimension integer
# SUM of its assigned grid vectors instead of their float mean — every
# training update is exact bigint arithmetic in both engines, and doubles
# appear only in the final (identical) cosine expression. Distributed
# shape per iteration: broadcast K centroids -> argmax assign (one window)
# -> map-side per-dimension sums -> K tiny rows collected to the driver.
# ---------------------------------------------------------------------------

_IVF_K = 16  # cells
_IVF_NPROBE = 4
_IVF_TRAIN_ITERS = 2  # fixed Lloyd iterations (mirrored in the oracle)


def _ivf_trained_centroids(spark: SparkSession, norm: DataFrame) -> DataFrame:
    """Fixed-iteration Lloyd over integer grid vectors; returns the trained
    centroid set as (cent_id, centg, centn2). Each iteration collects only
    K 64-int rows to the driver (bounded), never data-sized sets."""
    from pyspark.sql import Window

    seeds = (
        norm.filter(F.col("vec_id") < _IVF_K)
        .orderBy("vec_id")
        .select("vec_id", "g")
        .collect()
    )
    cents: list[tuple[int, list[int]]] = [
        (int(r["vec_id"]), [int(x) for x in r["g"]]) for r in seeds
    ]
    dims = len(cents[0][1]) if cents else 0
    for _ in range(_IVF_TRAIN_ITERS):
        cent_df = spark.createDataFrame(
            cents, "cent_id long, centg array<bigint>"
        ).withColumn(
            "centn2",
            F.expr("aggregate(centg, cast(0 as bigint), (acc, x) -> acc + x * x)"),
        )
        dot_c = F.expr(
            "aggregate(zip_with(g, centg, (x, y) -> x * y), cast(0 as bigint), (acc, x) -> acc + x)"
        )
        ccos = dot_c.cast("double") / (
            F.sqrt(F.col("n2").cast("double")) * F.sqrt(F.col("centn2").cast("double"))
        )
        scored = norm.crossJoin(F.broadcast(cent_df)).withColumn("ccos", ccos)
        # nearest-centroid assignment as a map-side-combinable max_by (same
        # tie-break as row_number over (ccos DESC, cent_id ASC): the struct
        # comparison maximizes ccos, then -cent_id = lowest id) — no N x K
        # sort shuffle, the partial agg keeps <= 1 row per vec per map task
        best = F.max_by(
            F.struct(F.col("cent_id"), F.col("g")),
            F.struct(F.col("ccos"), (-F.col("cent_id")).alias("nc")),
        )
        assign = (
            scored.groupBy("vec_id")
            .agg(best.alias("w"))
            .select(F.col("w.cent_id").alias("cell"), F.col("w.g").alias("g"))
        )
        sums = (
            assign.select("cell", F.posexplode("g").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "s"))),
                    lambda st: st["s"],
                ).alias("sumg")
            )
            .collect()
        )
        new = {int(r["cell"]): [int(x) for x in r["sumg"]] for r in sums}
        # an empty cell keeps its previous centroid (deterministic, mirrored)
        cents = [(cid, new.get(cid, prev)) for cid, prev in cents]
        assert all(len(g) == dims for _, g in cents)
    return spark.createDataFrame(
        cents, "cent_id long, centg array<bigint>"
    ).withColumn(
        "centn2",
        F.expr("aggregate(centg, cast(0 as bigint), (acc, x) -> acc + x * x)"),
    )


def q_embed_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_GRID.format(col="embedding")).alias("g")
    )
    norm = emb.withColumn(
        "n2", F.expr("aggregate(g, cast(0 as bigint), (acc, x) -> acc + x * x)")
    )
    cent = _ivf_trained_centroids(spark, norm)
    dot_c = F.expr(
        "aggregate(zip_with(g, centg, (x, y) -> x * y), cast(0 as bigint), (acc, x) -> acc + x)"
    )
    cos_c = dot_c.cast("double") / (
        F.sqrt(F.col("n2").cast("double")) * F.sqrt(F.col("centn2").cast("double"))
    )
    scored = norm.crossJoin(F.broadcast(cent)).withColumn("ccos", cos_c)
    # same max_by rewrite as training: the full-corpus assignment avoids
    # the N x K window sort (map-side partial agg instead), and the probe
    # branch filters to the 10 query vectors BEFORE its tiny window —
    # the vec_id predicate pushes below the broadcast cross join
    best = F.max_by(
        F.struct(F.col("cent_id"), F.col("g"), F.col("n2")),
        F.struct(F.col("ccos"), (-F.col("cent_id")).alias("nc")),
    )
    assign = (
        scored.groupBy("vec_id")
        .agg(best.alias("w"))
        .select(
            "vec_id",
            F.col("w.g").alias("g"),
            F.col("w.n2").alias("n2"),
            F.col("w.cent_id").alias("cell"),
        )
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("ccos"), F.asc("cent_id")
    )
    probes = (
        scored.filter(F.col("vec_id") < 10)
        .withColumn("crank", F.row_number().over(w_assign))
        .filter(F.col("crank") <= _IVF_NPROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("g").alias("qg"),
            F.col("n2").alias("qn2"),
            F.col("cent_id").alias("cell"),
        )
    )
    cand = assign.select(
        F.col("vec_id").alias("cand_id"),
        F.col("g").alias("cg"),
        F.col("n2").alias("cn2"),
        "cell",
    )
    pairs = probes.join(cand, "cell").filter(F.col("query_id") != F.col("cand_id"))
    dot = F.expr(
        "aggregate(zip_with(qg, cg, (x, y) -> x * y), cast(0 as bigint), (acc, x) -> acc + x)"
    )
    cos = dot.cast("double") / (
        F.sqrt(F.col("qn2").cast("double")) * F.sqrt(F.col("cn2").cast("double"))
    )
    w_top = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        pairs.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w_top))
        .filter(F.col("rank") <= 5)
        .select("query_id", "cand_id", F.col("cell").alias("cell"), "rank", "cosine")
    )


def _ivf_search_sql() -> str:
    # fixed-iteration Lloyd as chained CTEs, mirroring _ivf_trained_centroids
    # exactly: centroids are per-dimension bigint SUMS (scale-invariant under
    # cosine), so training is exact integer arithmetic in both engines
    lloyd = ["cent0 AS (\n  SELECT vec_id AS cent_id, g AS centg FROM n WHERE vec_id < %d\n)" % _IVF_K]
    for it in range(_IVF_TRAIN_ITERS):
        lloyd.append(f"""a{it} AS (
  SELECT v.vec_id, v.g, c.cent_id,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY CAST(list_sum(list_transform(range(1, 65), i -> v.g[i] * c.centg[i])) AS DOUBLE)
                      / (sqrt(CAST(v.n2 AS DOUBLE))
                         * sqrt(CAST(list_sum(list_transform(c.centg, x -> x * x)) AS DOUBLE))) DESC,
                    c.cent_id ASC
         ) AS crank
  FROM n v CROSS JOIN cent{it} c
)""")
        lloyd.append(f"""s{it} AS (
  SELECT cent_id, i AS pos, sum(g[i]) AS s
  FROM (SELECT cent_id, g FROM a{it} WHERE crank = 1) a
  CROSS JOIN range(1, 65) t(i)
  GROUP BY cent_id, i
)""")
        lloyd.append(f"""cent{it + 1} AS (
  SELECT c.cent_id,
         CASE WHEN count(s.s) = 0 THEN c.centg
              ELSE list(s.s ORDER BY s.pos) END AS centg
  FROM cent{it} c LEFT JOIN s{it} s ON s.cent_id = c.cent_id
  GROUP BY c.cent_id, c.centg
)""")
    lloyd_sql = ",\n".join(lloyd)
    return f"""
WITH g AS (
  SELECT vec_id, {_duck_grid('embedding')} AS g FROM embeddings
), n AS (
  SELECT vec_id, g, list_sum(list_transform(g, x -> x * x)) AS n2 FROM g
),
{lloyd_sql},
cent AS (
  SELECT cent_id, centg, list_sum(list_transform(centg, x -> x * x)) AS centn2
  FROM cent{_IVF_TRAIN_ITERS}
), scored AS (
  SELECT v.vec_id, v.g, v.n2, c.cent_id,
         CAST(list_sum(list_transform(range(1, 65), i -> v.g[i] * c.centg[i])) AS DOUBLE)
           / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.centn2 AS DOUBLE))) AS ccos
  FROM n v CROSS JOIN cent c
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS crank
  FROM scored
), assign AS (
  SELECT vec_id, g, n2, cent_id AS cell FROM ranked WHERE crank = 1
), probes AS (
  SELECT vec_id AS query_id, g AS qg, n2 AS qn2, cent_id AS cell
  FROM ranked WHERE vec_id < 10 AND crank <= {_IVF_NPROBE}
), pairs AS (
  SELECT p.query_id, a.vec_id AS cand_id, p.cell,
         CAST(list_sum(list_transform(range(1, 65), i -> p.qg[i] * a.g[i])) AS DOUBLE)
           / (sqrt(CAST(p.qn2 AS DOUBLE)) * sqrt(CAST(a.n2 AS DOUBLE))) AS cosine
  FROM probes p JOIN assign a ON p.cell = a.cell
  WHERE p.query_id <> a.vec_id
), topk AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank
  FROM pairs
)
SELECT query_id, cand_id, cell, rank, cosine FROM topk WHERE rank <= 5
"""

# ---------------------------------------------------------------------------
# dedup: embedding-cosine near-duplicates — the semantic-dedup flavor of the
# family (exact=dedup_exact, lexical=ngram/minhash/simhash). Candidates come
# from the SAME multi-table sign-LSH as embed_ann_search (md5-derived planes,
# so DuckDB computes identical buckets); only same-bucket pairs are scored,
# with an exact integer-grid cosine, and pairs >= the threshold are emitted
# as (keep_id, dup_id) with keep = smaller vec_id. Distributed shape at
# 100 TB: the pair generator is an equi self-join on (table, bucket) — hash-
# partitionable, never all-pairs — and every (table, bucket) group above
# _DEDUP_EMB_BUCKET_CAP is excluded BEFORE the join (one window count on the
# join key's own partitioning), so the worst bucket bounds the worst task.
# The cap genuinely bites at sf0.1 (max bucket 79 > cap 64) and the oracle
# mirrors it, so the sf0.1 verify_oracles sweep proves the capped semantics.
# The 0.4 threshold is tuned to the synthetic near-random test embeddings
# (max pairwise cosine 0.51/0.60 at sf0.01/0.1); real corpora use ~0.9 —
# the plan shape is threshold-independent.
# ---------------------------------------------------------------------------

_DEDUP_EMB_THRESHOLD = 0.4
_DEDUP_EMB_BUCKET_CAP = 64


def q_dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_GRID.format(col="embedding")).alias("g")
    )
    norm = emb.withColumn(
        "n2", F.expr("aggregate(g, cast(0 as bigint), (acc, x) -> acc + x * x)")
    )
    buckets = _mt_bucket_cols()
    keys = norm.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), b.alias("bucket"))
                    for t, b in enumerate(buckets)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    sized = keys.withColumn(
        "bsz", F.count(F.lit(1)).over(Window.partitionBy("tbl", "bucket"))
    ).filter(F.col("bsz") <= _DEDUP_EMB_BUCKET_CAP)
    lhs = sized.select(F.col("vec_id").alias("keep_id"), "tbl", "bucket")
    rhs = sized.select(F.col("vec_id").alias("dup_id"), "tbl", "bucket")
    cand = (
        lhs.join(rhs, ["tbl", "bucket"])
        .filter(F.col("keep_id") < F.col("dup_id"))
        .select("keep_id", "dup_id")
        .distinct()
    )
    av = norm.select(
        F.col("vec_id").alias("keep_id"), F.col("g").alias("ag"), F.col("n2").alias("an2")
    )
    bv = norm.select(
        F.col("vec_id").alias("dup_id"), F.col("g").alias("bg"), F.col("n2").alias("bn2")
    )
    dot = F.expr(
        "aggregate(zip_with(ag, bg, (x, y) -> x * y), cast(0 as bigint), (acc, x) -> acc + x)"
    )
    cos = dot.cast("double") / (
        F.sqrt(F.col("an2").cast("double")) * F.sqrt(F.col("bn2").cast("double"))
    )
    return (
        cand.join(av, "keep_id")
        .join(bv, "dup_id")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= F.lit(_DEDUP_EMB_THRESHOLD))
        .select("keep_id", "dup_id", "cosine")
    )


def _dedup_embed_cosine_sql() -> str:
    per_table = "\nUNION ALL\n".join(
        f"SELECT vec_id, {t} AS tbl, {_duck_mt_bucket(t)} AS bucket FROM g"
        for t in range(_ANN_TABLES)
    )
    return f"""
WITH g AS (
  SELECT vec_id, {_duck_grid('embedding')} AS g FROM embeddings
), n AS (
  SELECT vec_id, g, list_sum(list_transform(g, x -> x * x)) AS n2 FROM g
), keys AS (
  {per_table}
), sized AS (
  SELECT *, count(*) OVER (PARTITION BY tbl, bucket) AS bsz FROM keys
), cand AS (
  SELECT DISTINCT a.vec_id AS keep_id, b.vec_id AS dup_id
  FROM sized a JOIN sized b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE a.bsz <= {_DEDUP_EMB_BUCKET_CAP} AND b.bsz <= {_DEDUP_EMB_BUCKET_CAP}
), scored AS (
  SELECT c.keep_id, c.dup_id,
         CAST(list_sum(list_transform(range(1, 65), k -> a.g[k] * b.g[k])) AS DOUBLE)
           / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cosine
  FROM cand c JOIN n a ON a.vec_id = c.keep_id JOIN n b ON b.vec_id = c.dup_id
)
SELECT keep_id, dup_id, cosine FROM scored WHERE cosine >= {_DEDUP_EMB_THRESHOLD}
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    n_the = F.size(F.expr(r"regexp_extract_all(text, '\\bthe\\b', 0)"))
    n_a = F.size(F.expr(r"regexp_extract_all(text, '\\ba\\b', 0)"))
    n_data = F.size(F.expr(r"regexp_extract_all(text, '\\bdata\\b', 0)"))
    pred = (
        F.when(n_the > n_a, F.lit("en"))
        .when(n_a > n_data, F.lit("es"))
        .otherwise(F.lit("other"))
    )
    return (
        d.withColumn("lang_pred", pred)
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_SQL_LANG_ID = """
WITH scored AS (
  SELECT lang,
         len(regexp_extract_all(text, '\\bthe\\b')) AS n_the,
         len(regexp_extract_all(text, '\\ba\\b')) AS n_a,
         len(regexp_extract_all(text, '\\bdata\\b')) AS n_data
  FROM documents
)
SELECT lang,
       CASE WHEN n_the > n_a THEN 'en' WHEN n_a > n_data THEN 'es' ELSE 'other' END AS lang_pred,
       count(*) AS n_docs
FROM scored GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# text analysis: quality scoring + token counting
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and")


def _n_tokens_expr():
    """Whitespace token count — ONE definition shared by every consumer
    (quality scoring AND the filter cascade that composes it), so a
    tokenization tweak can never diverge the keep/drop decisions from the
    quality scores they claim to be built on."""
    return F.size(F.split(F.trim(F.col("text")), " "))


def _n_stopwords_expr():
    stop_arr = "array(" + ",".join(f"'{s}'" for s in _STOPWORDS) + ")"
    return F.expr(
        f"size(filter(split(trim(text), ' '), t -> array_contains({stop_arr}, t)))"
    )


#: DuckDB mirrors of the two expressions above (same single-definition rule)
_SQL_N_TOKENS = "len(string_split(trim(text), ' '))"
_SQL_N_STOPWORDS = (
    "len(list_filter(string_split(trim(text), ' '), t -> t IN ("
    + ", ".join(f"'{s}'" for s in _STOPWORDS)
    + ")))"
)


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    n_tokens = _n_tokens_expr()
    n_stop = _n_stopwords_expr()
    bpe_tokens = F.size(F.expr(r"regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)"))
    return d.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        bpe_tokens.alias("n_bpe_tokens"),
        n_stop.alias("n_stopwords"),
        (n_stop.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
        (F.length("text").cast("double") / n_tokens.cast("double")).alias("chars_per_token"),
    )


_SQL_TEXT_QUALITY = f"""
WITH base AS (
  SELECT doc_id, lang, length(text) AS n_chars,
         {_SQL_N_TOKENS} AS n_tokens,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
         {_SQL_N_STOPWORDS} AS n_stopwords
  FROM documents
)
SELECT doc_id, lang, n_chars, n_tokens, n_bpe_tokens, n_stopwords,
       CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
       CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS chars_per_token
FROM base
"""

def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style filter CASCADE: the per-document keep/drop decision a
    pretraining pipeline makes, composing the suite's quality signals into
    one auditable row per document — language gate (the ``lang_id``
    heuristic), token-length bounds, stopword-ratio floor, and a
    chars-per-token sanity band. ``reasons`` lists every tripped gate (a
    deterministic comma-joined string, so the audit is engine-portable);
    ``keep`` is the conjunction. All gates are pure column expressions over
    ONE scan — zero shuffles, zero per-row Python; at 100 TB the cascade is
    a map-only pass whose output feeds ``corpus_split`` / ``corpus_mixture``
    downstream. Thresholds are calibrated so every gate trips on the
    synthetic corpus (see the distribution probe in the oracle); the SHAPE
    is threshold-independent.
    """
    d = _t(spark, sf_dir, "documents")
    n_the = F.size(F.expr(r"regexp_extract_all(text, '\\bthe\\b', 0)"))
    n_a = F.size(F.expr(r"regexp_extract_all(text, '\\ba\\b', 0)"))
    n_tokens = _n_tokens_expr()
    n_stop = _n_stopwords_expr()
    stop_ratio = n_stop.cast("double") / n_tokens.cast("double")
    cpt = F.length("text").cast("double") / n_tokens.cast("double")
    gates = [
        ("bad_lang", ~(n_the > n_a)),
        ("too_short", n_tokens < F.lit(20)),
        ("too_long", n_tokens > F.lit(90)),
        ("low_stopword", stop_ratio < F.lit(0.03)),
        ("weird_tokens", cpt > F.lit(6.0)),
    ]
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in gates]
    )
    keep = F.lit(True)
    for _name, cond in gates:
        keep = keep & ~cond
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        cpt.alias("chars_per_token"),
        reasons.alias("reasons"),
        keep.alias("keep"),
    )


_SQL_CORPUS_FILTER = f"""
WITH s AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\\bthe\\b')) AS n_the,
         len(regexp_extract_all(text, '\\ba\\b')) AS n_a,
         {_SQL_N_TOKENS} AS n_tokens,
         {_SQL_N_STOPWORDS} AS n_stop,
         length(text) AS n_chars
  FROM documents
), g AS (
  SELECT doc_id, n_tokens,
         CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
         CAST(n_chars AS DOUBLE) / n_tokens AS chars_per_token,
         NOT (n_the > n_a) AS bad_lang,
         n_tokens < 20 AS too_short,
         n_tokens > 90 AS too_long,
         CAST(n_stop AS DOUBLE) / n_tokens < 0.03 AS low_stopword,
         CAST(n_chars AS DOUBLE) / n_tokens > 6.0 AS weird_tokens
  FROM s
)
SELECT doc_id, n_tokens, stopword_ratio, chars_per_token,
       concat_ws(',',
         CASE WHEN bad_lang THEN 'bad_lang' END,
         CASE WHEN too_short THEN 'too_short' END,
         CASE WHEN too_long THEN 'too_long' END,
         CASE WHEN low_stopword THEN 'low_stopword' END,
         CASE WHEN weird_tokens THEN 'weird_tokens' END) AS reasons,
       NOT (bad_lang OR too_short OR too_long OR low_stopword OR weird_tokens) AS keep
FROM g
"""



# ---------------------------------------------------------------------------
# text analysis: document fingerprinting
# ---------------------------------------------------------------------------


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return d.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.substring(F.md5(norm), 1, 4).alias("fp_prefix"),
        F.length(norm).alias("norm_len"),
    )


_SQL_DOC_FINGERPRINT = f"""
SELECT doc_id,
       md5({_NORM.format(c='text')}) AS fingerprint,
       substring(md5({_NORM.format(c='text')}), 1, 4) AS fp_prefix,
       length({_NORM.format(c='text')}) AS norm_len
FROM documents
"""

# ---------------------------------------------------------------------------
# text analysis: benchmark decontamination (eval n-gram overlap)
# ---------------------------------------------------------------------------

#: shingle length for decontamination. Real pipelines use 13-grams; the
#: synthetic corpus's ~30-word vocabulary makes 13-grams vanishingly rare
#: (zero hits at every sf), so 4 is the calibrated analog: 31 contaminated
#: docs at sf0.01, 2160 at sf0.1 — non-trivial and discriminating. The
#: DISTRIBUTED SHAPE is length-independent.
_DECON_K = 4
#: deterministic held-out "eval split": doc_id % 23 == 0 (~4 % of docs) —
#: derived from the corpus itself so tests/benchmarks need no external data.
_DECON_EVAL_MOD = 23


def _kgram_shingles(d: DataFrame, k: int) -> DataFrame:
    """doc_id → exploded distinct word-k-gram shingles (map-side only)."""
    toks = F.split(F.trim(F.col("text")), " ")
    expr = (
        f"transform(sequence(0, size(_toks) - {k}), "
        f"i -> array_join(slice(_toks, i + 1, {k}), ' '))"
    )
    return (
        d.select("doc_id", toks.alias("_toks"))
        .filter(F.size("_toks") >= k)
        .select("doc_id", F.explode(F.expr(expr)).alias("shingle"))
        .distinct()
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word-``_DECON_K``-gram with a held-out eval split — the step every
    LLM training pipeline runs so eval answers don't leak into training
    data (the reference pipeline has no analog; this is pure
    training-data surface).

    Scale shape: the eval split is a tiny fraction of the corpus, so its
    distinct shingle set is **broadcast** and the 100-TB training side
    streams map-side through the hash join — the corpus is NEVER
    shuffled by shingle. The only exchange on the big side is the final
    groupBy(doc_id), whose input is just the matched rows. (The
    per-side ``.distinct()`` inside ``_kgram_shingles`` on the train
    side does shuffle shingles; at real scale you'd drop it and rely on
    countDistinct — kept here because the oracle counts distinct hits.)
    """
    d = _t(spark, sf_dir, "documents")
    sh = _kgram_shingles(d, _DECON_K)
    is_eval = (F.col("doc_id") % _DECON_EVAL_MOD) == 0
    esh = sh.filter(is_eval).select(
        F.col("doc_id").alias("eval_id"), "shingle"
    )
    tsh = sh.filter(~is_eval)
    return (
        tsh.join(F.broadcast(esh), "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_hit_shingles"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )


_SQL_DECONTAMINATE = f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - {_DECON_K - 2}),
                i -> array_to_string(t[i:i+{_DECON_K - 1}], ' '))) AS shingle
  FROM toks WHERE len(t) >= {_DECON_K}
),
esh AS (SELECT DISTINCT doc_id AS eval_id, shingle FROM sh
        WHERE doc_id % {_DECON_EVAL_MOD} = 0),
tsh AS (SELECT DISTINCT doc_id, shingle FROM sh
        WHERE doc_id % {_DECON_EVAL_MOD} <> 0)
SELECT t.doc_id,
       count(DISTINCT t.shingle) AS n_hit_shingles,
       count(DISTINCT e.eval_id) AS n_eval_docs
FROM tsh t JOIN esh e USING (shingle)
GROUP BY 1
"""

# ---------------------------------------------------------------------------
# text analysis: repetition / boilerplate scoring (Gopher-style rules)
# ---------------------------------------------------------------------------

#: Gopher-style repetition thresholds (Rae et al. 2021, "Scaling Language
#: Models" §A1.1 quality rules — public): a doc is flagged when its
#: type-token ratio collapses or one bigram dominates.
_REP_MIN_DISTINCT_RATIO = 0.3
_REP_MAX_TOP_BIGRAM_RATIO = 0.18


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/boilerplate detection per document: type-token ratio,
    most-frequent-token share, most-frequent-bigram share, and the
    Gopher-style keep/drop flag.

    Scale shape: tokens and bigrams are derived map-side from the text
    array, then counted via explode → two-level hash aggregation keyed by
    (doc_id, gram) — partial (map-side) aggregation absorbs within-doc
    repetition before the exchange, so a pathological 10^6-token
    boilerplate doc ships one row per DISTINCT gram, not per token. No
    O(tokens²) per-row array scans (which would stall an executor on one
    long doc at 100 TB).
    """
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    bg_expr = (
        "transform(sequence(0, size(_toks) - 2), "
        "i -> concat_ws(' ', _toks[i], _toks[i+1]))"
    )
    base = d.select("doc_id", toks.alias("_toks")).filter(F.size("_toks") >= 2)
    tok_counts = (
        base.select("doc_id", F.explode("_toks").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tok_stats = tok_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_tok"),
    )
    bg_counts = (
        base.select("doc_id", F.explode(F.expr(bg_expr)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bg_stats = bg_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bigram")
    )
    dr = F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double")
    tr = F.col("top_tok").cast("double") / F.col("n_tokens").cast("double")
    br = F.col("top_bigram").cast("double") / F.col("n_bigrams").cast("double")
    return (
        tok_stats.join(bg_stats, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            dr.alias("distinct_ratio"),
            tr.alias("top_token_ratio"),
            br.alias("top_bigram_ratio"),
            (
                (dr < F.lit(_REP_MIN_DISTINCT_RATIO))
                | (br > F.lit(_REP_MAX_TOP_BIGRAM_RATIO))
            ).alias("flag_repetitive"),
        )
    )


_SQL_TEXT_REPETITION = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok,
         generate_subscripts(string_split(trim(text), ' '), 1) AS pos
  FROM documents
),
big AS (
  SELECT a.doc_id, a.tok || ' ' || b.tok AS bg
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
ts AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
              count(*) AS n_distinct, max(c) AS top_tok FROM tc GROUP BY 1),
bc AS (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY 1, 2),
bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
              max(c) AS top_bigram FROM bc GROUP BY 1)
SELECT ts.doc_id, n_tokens,
       CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS distinct_ratio,
       CAST(top_tok AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_ratio,
       CAST(top_bigram AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS top_bigram_ratio,
       (CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
          < {_REP_MIN_DISTINCT_RATIO}
        OR CAST(top_bigram AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
          > {_REP_MAX_TOP_BIGRAM_RATIO}) AS flag_repetitive
FROM ts JOIN bs USING (doc_id)
"""

# ---------------------------------------------------------------------------
# training-example assembly: sequence packing into fixed token budgets
# ---------------------------------------------------------------------------

#: training context length (tokens) that documents are packed into
_PACK_CTX = 512


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign whole documents to fixed-token-budget
    training contexts — the assembly step between a cleaned corpus and a
    tokenized training shard. Contiguous streaming packing: within each
    ``source`` shard, docs are taken in ``doc_id`` order and a doc joins
    the pack containing its START offset (``running_tokens_before_doc
    div CTX``), so packs are deterministic, document-atomic, and may
    overrun the budget by at most one document's tail — the standard
    atomic-document packing contract.

    Scale shape: ONE hash-partition-by-source sort feeds the running sum,
    and the per-pack rollup reuses that partitioning (pack_id is a
    function of source + running sum), so the whole query is a single
    exchange. Parallelism = number of source shards; skew is bounded by
    docs-per-shard, which a real pipeline controls by sharding the
    corpus before packing (exactly what ``source`` models). Integer
    ``div`` keeps the bin assignment exact on both engines.
    """
    d = _t(spark, sf_dir, "documents")
    n_toks = F.size(F.split(F.trim(F.col("text")), " "))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = d.select("source", "doc_id", n_toks.alias("n_toks"))
    binned = base.withColumn("_cum", F.sum("n_toks").over(w)).withColumn(
        "pack_id", F.expr(f"(_cum - n_toks) div {_PACK_CTX}")
    )
    return binned.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        F.min("doc_id").alias("first_doc_id"),
        (F.sum("n_toks").cast("double") / F.lit(float(_PACK_CTX))).alias(
            "fill_ratio"
        ),
    )


_SQL_PACK_SEQUENCES = f"""
WITH t AS (
  SELECT source, doc_id, len(string_split(trim(text), ' ')) AS n_toks
  FROM documents
),
c AS (
  SELECT source, doc_id, n_toks,
         (sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks)
           // {_PACK_CTX} AS pack_id
  FROM t
)
SELECT source, CAST(pack_id AS BIGINT) AS pack_id,
       count(*) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc_id,
       CAST(sum(n_toks) AS DOUBLE) / {float(_PACK_CTX)} AS fill_ratio
FROM c GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# text analysis: PII detection + redaction
# ---------------------------------------------------------------------------

#: PII patterns — written in the common Java-regex/RE2 subset so Spark
#: (java.util.regex) and the DuckDB oracle (RE2) match identically.
_PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
_PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
_PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction: scrub emails, phone numbers, and IPv4
    addresses from document text and report per-doc counts — the
    pre-release privacy pass every LLM training pipeline runs (no
    reference analog; pure training-data surface, like ``decontaminate``).

    The synthetic corpus contains no PII, so the query first **injects**
    deterministic PII derived from ``doc_id`` (emails on ``doc_id%5==0``,
    phones on ``%7``, IPs on ``%3``; the oracle performs the identical
    injection) — this makes the redaction path discriminating at every sf
    while keeping the benchmark self-contained. The redacted text is
    compared via md5 so the oracle proves byte-identical replacement, not
    just matching counts.

    Scale shape: pure map-side column expressions (concat, regexp_count,
    chained regexp_replace, md5) — zero exchanges, embarrassingly
    parallel, the ideal 100-TB shape. Redaction order is fixed
    (email → phone → IP) so overlapping matches resolve identically on
    both engines.
    """
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" reach u"), did.cast("string"), F.lit("@example.com")
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" call 202-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (did % 256).cast("string"),
                F.lit("."),
                F.expr("cast((doc_id div 7) % 256 as string)"),
            ),
        ).otherwise(F.lit("")),
    )
    base = d.select("doc_id", injected.alias("_txt"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("_txt"), _PII_EMAIL_RE, "<EMAIL>"),
            _PII_PHONE_RE,
            "<PHONE>",
        ),
        _PII_IPV4_RE,
        "<IP>",
    )
    n_email = F.regexp_count(F.col("_txt"), F.lit(_PII_EMAIL_RE))
    n_phone = F.regexp_count(F.col("_txt"), F.lit(_PII_PHONE_RE))
    n_ip = F.regexp_count(F.col("_txt"), F.lit(_PII_IPV4_RE))
    return base.select(
        "doc_id",
        n_email.alias("n_emails"),
        n_phone.alias("n_phones"),
        n_ip.alias("n_ips"),
        (n_email + n_phone + n_ip).alias("n_redactions"),
        ((n_email + n_phone + n_ip) == 0).alias("is_clean"),
        F.md5(redacted).alias("redacted_md5"),
    )


_SQL_REDACT_PII = f"""
WITH inj AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 5 = 0
              THEN ' reach u' || CAST(doc_id AS VARCHAR) || '@example.com'
              ELSE '' END
         || CASE WHEN doc_id % 7 = 0
              THEN ' call 202-555-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END
         || CASE WHEN doc_id % 3 = 0
              THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
                   || CAST((doc_id // 7) % 256 AS VARCHAR)
              ELSE '' END AS _txt
  FROM documents
),
counted AS (
  SELECT doc_id, _txt,
         len(regexp_extract_all(_txt, '{_PII_EMAIL_RE}')) AS n_emails,
         len(regexp_extract_all(_txt, '{_PII_PHONE_RE}')) AS n_phones,
         len(regexp_extract_all(_txt, '{_PII_IPV4_RE}')) AS n_ips
  FROM inj
)
SELECT doc_id,
       CAST(n_emails AS INTEGER) AS n_emails,
       CAST(n_phones AS INTEGER) AS n_phones,
       CAST(n_ips AS INTEGER) AS n_ips,
       CAST(n_emails + n_phones + n_ips AS INTEGER) AS n_redactions,
       (n_emails + n_phones + n_ips) = 0 AS is_clean,
       md5(regexp_replace(regexp_replace(regexp_replace(
             _txt, '{_PII_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_PII_PHONE_RE}', '<PHONE>', 'g'),
             '{_PII_IPV4_RE}', '<IP>', 'g')) AS redacted_md5
FROM counted
"""

# ---------------------------------------------------------------------------
# sessionization: gap-based session assignment
# ---------------------------------------------------------------------------

#: inactivity gap that closes a session, seconds
_SESSION_GAP_SECS = 1800


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the ``events`` stream: per user, a new
    session starts whenever the inactivity gap exceeds 30 minutes — the
    batch form of Structured Streaming's ``session_window`` and the
    standard conversation/visit segmentation step in a training-data
    pipeline. Two windows over ONE hash-partition-by-user sort (lag for
    the boundary flag, running sum for the session index), then an
    algebraic per-session rollup: a single shuffle end-to-end, skew
    bounded by events-per-user. The gap is compared in exact integer
    MICROSECONDS on both engines (``unix_micros`` here, ``epoch_us`` in
    the oracle): timestamps carry sub-second fractions, and a
    second-truncated or floating gap would disagree with the oracle for
    gaps within a second of the boundary. Differences of epochs (never
    absolute values) drive the flag, so any timezone shift cancels.
    """
    ev = _t(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    # NTZ has no direct micros accessor; the via-timestamp epoch is
    # tz-shifted but the shift cancels in the difference
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = tus - F.lag(tus).over(w)
    new_s = F.when(
        gap.isNull() | (gap > F.lit(_SESSION_GAP_SECS) * F.lit(1_000_000)),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = ev.withColumn("session_idx", F.sum(new_s).over(run))
    return sess.groupBy("user_id", "session_idx").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        _dsum("value", 4).alias("sum_value"),
    )


_SQL_SESSIONIZE = f"""
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {_SESSION_GAP_SECS} * 1000000
                   OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM g
)
SELECT user_id, session_idx,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM s GROUP BY user_id, session_idx
"""

# ---------------------------------------------------------------------------
# training data: deterministic stratified sampling
# ---------------------------------------------------------------------------

#: per-language keep fraction in sixteenths (md5 first hex digit < limit).
#: downsample the majority language, keep more of the rest — the standard
#: language-rebalancing step before training-corpus assembly.
_SAMPLE_SIXTEENTHS = {"en": 4, "_default": 10}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based stratified sampling of ``documents``:
    keep a per-language fraction decided by the first hex digit of
    ``md5('samp:' || doc_id)`` — reproducible across engines, clusters
    and reruns (no RNG state), trivially parallel (pure map, no shuffle
    for the filter; one algebraic rollup proves the per-stratum counts).
    This is how a 100 TB corpus is rebalanced: the sample membership of a
    document never depends on partitioning or scan order.
    """
    d = _t(spark, sf_dir, "documents")
    hexd = F.substring(F.md5(F.concat(F.lit("samp:"), F.col("doc_id"))), 1, 1)
    limit_hex = F.when(
        F.col("lang") == "en", F.lit(hex(_SAMPLE_SIXTEENTHS["en"])[2:])
    ).otherwise(F.lit(hex(_SAMPLE_SIXTEENTHS["_default"])[2:]))
    kept = d.filter(hexd < limit_hex)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.sum("n_chars").alias("sum_chars"),
    )


_SQL_STRATIFIED_SAMPLE = f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_sampled,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE substring(md5('samp:' || doc_id), 1, 1)
      < CASE WHEN lang = 'en' THEN '{hex(_SAMPLE_SIXTEENTHS["en"])[2:]}'
             ELSE '{hex(_SAMPLE_SIXTEENTHS["_default"])[2:]}' END
GROUP BY lang
"""

# ---------------------------------------------------------------------------
# text analysis: exact per-group length quantiles (rank-selected)
# ---------------------------------------------------------------------------

_QUANTILES = (0.5, 0.9, 0.99)


def q_doc_len_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language length quantiles over ``documents`` — the
    corpus-profiling step that sizes truncation/packing budgets. The
    quantile is RANK-SELECTED (value at row ``ceil(q*n)`` under a total
    (n_chars, doc_id) order), not interpolated: selection is pure integer
    arithmetic, so Spark and the oracle agree bit-for-bit — interpolated
    ``percentile`` forms differ across engines in float op order. One
    shuffle (partition by lang) + per-partition sort; at 100 TB the same
    shape, with per-language skew bounded by the documents-per-language
    split (or salt + two-level selection if one language dominates).
    """
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    cnt = Window.partitionBy("lang")
    r = d.select(
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("n"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(q) * F.col("n")), F.col("n_chars")
            )
        ).alias(f"p{int(q * 100)}")
        for q in _QUANTILES
    ]
    return r.groupBy("lang").agg(
        F.max("n").alias("n_docs"), *aggs
    )


_SQL_DOC_LEN_QUANTILES = f"""
WITH r AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT lang, max(n) AS n_docs,
       {", ".join(f"max(CASE WHEN rn = CAST(ceil({q}*n) AS BIGINT) THEN n_chars END) AS p{int(q*100)}" for q in _QUANTILES)}
FROM r GROUP BY lang
"""

# ---------------------------------------------------------------------------
# dedup: cross-corpus exact span dedup (C4-style duplicate-chunk removal)
# ---------------------------------------------------------------------------

#: words per chunk — the span granularity of the cross-document dedup.
_CHUNK_W = 8


def q_dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus CHUNK-level exact dedup (the C4 "remove duplicated
    spans across the corpus, keep the first occurrence" step — doc-level
    dedup misses boilerplate repeated inside otherwise-distinct pages).

    Documents split into consecutive ``_CHUNK_W``-word chunks map-side
    (``transform`` + ``slice`` — no shuffle); the global first occurrence
    of each chunk fingerprint is chosen with a **map-side-combinable
    ``min(struct(doc_id, chunk_idx))`` aggregate**, NOT a ``row_number``
    window: a boilerplate chunk repeated 10^8 times across a 100 TB corpus
    would put all 10^8 rows into one window reducer, while the algebraic
    min collapses each hot fingerprint to ≤1 row per map task before the
    exchange (AQE skew-join handles the probe side of the join back).
    Survivors reassemble per document in chunk order. Three exchanges
    (winner agg by fp, join by fp, reassembly by doc_id), each keyed and
    partial-aggregated. Output is one row per document with counts and the
    md5 of the cleaned text (byte-exact vs the oracle's reassembly).
    """
    d = _t(spark, sf_dir, "documents")
    w = _CHUNK_W
    chunks_expr = (
        f"transform(sequence(0, int(ceil(size(_toks) / {w}.0)) - 1), "
        f"i -> concat_ws(' ', slice(_toks, i * {w} + 1, {w})))"
    )
    ch = (
        d.select("doc_id", F.split(F.trim(F.col("text")), " ").alias("_toks"))
        .filter(F.size("_toks") >= 1)
        .select(
            "doc_id", F.posexplode(F.expr(chunks_expr)).alias("chunk_idx", "chunk")
        )
        .withColumn("fp", F.md5("chunk"))
    )
    winners = ch.groupBy("fp").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("w")
    )
    flagged = ch.join(winners, "fp").withColumn(
        "kept",
        (F.col("doc_id") == F.col("w.doc_id"))
        & (F.col("chunk_idx") == F.col("w.chunk_idx")),
    )
    out = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("kept"), F.struct("chunk_idx", "chunk"))
                    )
                ),
                lambda x: x["chunk"],
            ),
            " ",
        ).alias("_clean"),
    )
    return out.select(
        "doc_id",
        "n_chunks",
        "n_kept",
        F.when(F.col("n_kept") > 0, F.md5("_clean")).alias("clean_fp"),
    )


_SQL_DEDUP_CHUNKS = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(trim(text), ' ')) AS tok,
         generate_subscripts(string_split(trim(text), ' '), 1) AS pos
  FROM documents
),
chunks AS (
  SELECT doc_id, (pos - 1) // {_CHUNK_W} AS chunk_idx,
         string_agg(tok, ' ' ORDER BY pos) AS chunk
  FROM toks GROUP BY doc_id, (pos - 1) // {_CHUNK_W}
),
ranked AS (
  SELECT doc_id, chunk_idx, chunk,
         row_number() OVER (
           PARTITION BY md5(chunk) ORDER BY doc_id, chunk_idx
         ) AS rn
  FROM chunks
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
       CASE WHEN count(*) FILTER (WHERE rn = 1) > 0
            THEN md5(string_agg(chunk, ' ' ORDER BY chunk_idx)
                     FILTER (WHERE rn = 1))
       END AS clean_fp
FROM ranked GROUP BY doc_id
"""

# ---------------------------------------------------------------------------
# OLAP: multi-level rollup via CUBE (grouping sets)
# ---------------------------------------------------------------------------


def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregate over ``events`` via ``CUBE(event_type, day)``
    — all four grouping sets (per type+day, per type, per day, grand
    total) in ONE pass. Spark plans this as an Expand (4× row multiplier)
    feeding a single hash aggregate whose map-side partial absorbs the
    expansion before the only exchange; the distinct-user count rides the
    same pass via the standard two-level distinct-aggregate rewrite. At
    100 TB the knob is choosing ROLLUP / explicit GROUPING SETS over full
    CUBE when not all 2^d sets are needed — the Expand multiplier is the
    cost driver, not the shuffle. Money sums go through exact DECIMAL and
    only cast to double at the end (float sum order differs across
    engines; decimal addition is associative).
    """
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.col("value").cast("decimal(18,2)").alias("_v"),
            "user_id",
        )
        .cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_v").cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


_SQL_EVENTS_CUBE = """
SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY CUBE (event_type, strftime(ts, '%Y-%m-%d'))
"""

# ---------------------------------------------------------------------------
# corpus management: deterministic train/valid/test split
# ---------------------------------------------------------------------------

#: exclusive upper bounds on the first two md5 hex digits (of 256 buckets):
#: < 0xcc train (~79.7 %), < 0xe6 valid (~10.2 %), else test (~10.1 %).
_SPLIT_BOUNDS = {"train": 0xCC, "valid": 0xE6}


def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/valid/test corpus split with
    per-split profile stats. Membership is a pure function of
    ``md5('split:' || doc_id)`` — like :func:`q_stratified_sample`, it is
    reproducible across engines, partitionings, cluster sizes and reruns
    (no RNG state, no scan-order dependence), which is what makes a split
    auditable on a 100 TB corpus: any engine can re-derive which split a
    document belongs to from the document alone. The split itself is a
    zero-shuffle map; the profile (doc/token/char totals, language
    coverage) is one rollup over 3 groups (two exchanges in the plan only
    because of the countDistinct two-level rewrite, both partial-agg'd).
    """
    d = _t(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id"))), 1, 2)
    split = (
        F.when(h2 < F.lit(format(_SPLIT_BOUNDS["train"], "02x")), F.lit("train"))
        .when(h2 < F.lit(format(_SPLIT_BOUNDS["valid"], "02x")), F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    n_toks = F.size(F.split(F.trim(F.col("text")), " "))
    return (
        d.select(
            split.alias("split"), n_toks.alias("_n_toks"), "n_chars", "lang", "doc_id"
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n_toks").alias("sum_tokens"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


_SQL_CORPUS_SPLIT = f"""
WITH s AS (
  SELECT CASE
           WHEN substring(md5('split:' || doc_id), 1, 2)
                < '{format(_SPLIT_BOUNDS["train"], "02x")}' THEN 'train'
           WHEN substring(md5('split:' || doc_id), 1, 2)
                < '{format(_SPLIT_BOUNDS["valid"], "02x")}' THEN 'valid'
           ELSE 'test'
         END AS split,
         len(string_split(trim(text), ' ')) AS n_toks,
         n_chars, lang, doc_id
  FROM documents
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM s GROUP BY split
"""


def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixture weighting — the training-data op that
    assembles a pretraining mix from differently-weighted sources
    ("web ×2.5 epochs, forums ×0.25, exclude srcX"). Per source class
    (source index mod 4 here) a weight w produces floor(w) full copies of
    every document plus one more iff a document-derived uniform
    (``md5('mix:' || doc_id)`` hex prefix, compared as a STRING against
    the fraction's 4-hex-digit bound — no float conversion, engine-exact)
    falls under frac(w). Like :func:`q_corpus_split`, membership and
    replication are pure functions of the document — reproducible across
    engines, partitionings, reruns and cluster sizes, auditable per
    document at 100 TB. Plan shape: zero shuffles — a map-side weight
    assignment + ``explode(sequence(...))``; output size is
    sum(w_i · |source_i|) by construction (replication bounded by the
    declared weights, never a join blow-up). Weights here: 2.5 / 1.0 /
    0.25 / 0.0 — exercising replication, identity, downsampling, and full
    source exclusion.
    """
    d = _t(spark, sf_dir, "documents")
    idx = F.expr("CAST(substring(source, 4) AS INT) % 4")
    u = F.substring(
        F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 4
    )
    whole = (
        F.when(idx == 0, F.lit(2)).when(idx == 1, F.lit(1)).otherwise(F.lit(0))
    )
    frac_bound = (
        F.when(idx == 0, F.lit("8000"))  # frac(2.5)  = 0.5  -> 0x8000
        .when(idx == 2, F.lit("4000"))   # frac(0.25) = 0.25 -> 0x4000
        .otherwise(F.lit("0000"))
    )
    n_copies = whole + (u < frac_bound).cast("int")
    return (
        d.select("doc_id", "source", n_copies.alias("_n"))
        .filter(F.col("_n") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("copy_idx"),
        )
    )


_SQL_CORPUS_MIXTURE = """
WITH d AS (
  SELECT doc_id, source,
         CAST(substring(source, 4) AS INTEGER) % 4 AS idx,
         substring(md5('mix:' || doc_id), 1, 4) AS u
  FROM documents
), c AS (
  SELECT doc_id, source,
         (CASE idx WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 0 END)
         + CASE WHEN u < (CASE idx WHEN 0 THEN '8000'
                                   WHEN 2 THEN '4000'
                                   ELSE '0000' END)
                THEN 1 ELSE 0 END AS n_copies
  FROM d
)
SELECT c.doc_id, c.source, CAST(t.copy_idx AS INTEGER) AS copy_idx
FROM c, unnest(generate_series(1, c.n_copies)) AS t(copy_idx)
WHERE c.n_copies > 0
"""


_SOURCE_QUOTA = 10


def q_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document quota — the corpus-governance op that caps any
    one source's contribution to the training mix ("no domain may exceed
    N documents"), deterministically: within each source, documents are
    ranked by ``md5('quota:' || doc_id)`` (doc_id tiebreak) and the first
    ``_SOURCE_QUOTA`` survive. Like the split/mixture ops, selection is a
    pure function of the document set — reproducible across engines,
    reruns, and partitionings, and auditable per document (a doc's rank
    explains its exclusion). Plan shape: ONE hash-by-source exchange for
    the rank window; the md5 rank key is computed map-side. At 100 TB,
    sources are typically domains with heavy skew (one domain holding
    10^8 docs) — exact ranking then pays that skew in one reducer, and
    the documented scale knob is the threshold form (keep iff the same
    uniform < quota/|source|, zero-shuffle given per-source counts, the
    same trade :func:`q_corpus_mixture` makes); the exact form stays the
    oracle because the quota here is a hard cap, not a rate."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    rank_key = F.md5(
        F.concat(F.lit("quota:"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("source").orderBy(rank_key, F.col("doc_id"))
    return (
        d.select("doc_id", "source")
        .withColumn("quota_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("quota_rank") <= _SOURCE_QUOTA)
    )


_SQL_SOURCE_QUOTA = f"""
SELECT doc_id, source, CAST(rk AS BIGINT) AS quota_rank FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('quota:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
) WHERE rk <= {_SOURCE_QUOTA}
"""

# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

#: name -> (spark_fn, oracle_sql | None)
SQL_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "windowed_scan": (q_windowed_scan, _SQL_WINDOWED_SCAN),
    "lww_latest": (q_lww_latest, _SQL_LWW_LATEST),
    "broadcast_enrich": (q_broadcast_enrich, _SQL_BROADCAST_ENRICH),
    "eav_pivot": (q_eav_pivot, _SQL_EAV_PIVOT),
    "classify_regex": (q_classify_regex, _SQL_CLASSIFY_REGEX),
    "entity_registry": (q_entity_registry, _SQL_ENTITY_REGISTRY),
    "dim_explode": (q_dim_explode, _SQL_DIM_EXPLODE),
    "json_extract": (q_json_extract, _SQL_JSON_EXTRACT),
    "time_rollup": (q_time_rollup, _SQL_TIME_ROLLUP),
    "epoch_millis": (q_epoch_millis, _SQL_EPOCH_MILLIS),
    "pricing_summary": (q_pricing_summary, _SQL_PRICING_SUMMARY),
    "topk_customers": (q_topk_customers, _SQL_TOPK_CUSTOMERS),
    "union_entities": (q_union_entities, _SQL_UNION_ENTITIES),
    "anti_new_entities": (q_anti_new_entities, _SQL_ANTI_NEW_ENTITIES),
    "dedup_exact": (q_dedup_exact, _SQL_DEDUP_EXACT),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, _SQL_DEDUP_NGRAM_JACCARD),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, _SQL_DEDUP_MINHASH_LSH),
    "dedup_minhash_verified": (q_dedup_minhash_verified, _minhash_verified_sql()),
    "dedup_clusters": (q_dedup_clusters, _dedup_clusters_sql()),
    "dedup_simhash": (q_dedup_simhash, _simhash_sql()),
    "dedup_embed_cosine": (q_dedup_embed_cosine, _dedup_embed_cosine_sql()),
    "embed_cosine_topk": (q_embed_cosine_topk, _SQL_EMBED_COSINE_TOPK),
    "embed_ann_lsh": (q_embed_ann_lsh, _ann_lsh_sql()),
    "embed_ann_search": (q_embed_ann_search, _ann_search_sql()),
    "embed_ivf_search": (q_embed_ivf_search, _ivf_search_sql()),
    "sessionize": (q_sessionize, _SQL_SESSIONIZE),
    "stratified_sample": (q_stratified_sample, _SQL_STRATIFIED_SAMPLE),
    "doc_len_quantiles": (q_doc_len_quantiles, _SQL_DOC_LEN_QUANTILES),
    "lang_id": (q_lang_id, _SQL_LANG_ID),
    "text_quality": (q_text_quality, _SQL_TEXT_QUALITY),
    "doc_fingerprint": (q_doc_fingerprint, _SQL_DOC_FINGERPRINT),
    "corpus_filter": (q_corpus_filter, _SQL_CORPUS_FILTER),
    "decontaminate": (q_decontaminate, _SQL_DECONTAMINATE),
    "text_repetition": (q_text_repetition, _SQL_TEXT_REPETITION),
    "pack_sequences": (q_pack_sequences, _SQL_PACK_SEQUENCES),
    "redact_pii": (q_redact_pii, _SQL_REDACT_PII),
    "dedup_chunks": (q_dedup_chunks, _SQL_DEDUP_CHUNKS),
    "corpus_split": (q_corpus_split, _SQL_CORPUS_SPLIT),
    "corpus_mixture": (q_corpus_mixture, _SQL_CORPUS_MIXTURE),
    "source_quota": (q_source_quota, _SQL_SOURCE_QUOTA),
    "events_cube": (q_events_cube, _SQL_EVENTS_CUBE),
}
