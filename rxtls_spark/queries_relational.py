"""Relational operator coverage (SURVEY §2.2-2.7 generalized) over the
driver's TPC-H-ish tables — every query oracle-checked against DuckDB.

These exercise the Spark built-ins the pipeline relies on (broadcast /
semi / anti joins, partial-agg groupBy, window functions, tumbling
windows, set ops, deterministic top-k) so the engine's general query
surface is validated, not just the flagship path.

Float discipline: aggregate doubles are rounded (2-5 dp) on BOTH sides
— summation order differs between engines and bit-exact equality is
not meaningful for floating point.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- aggregations (A1/A6 generalized: partial+final hash agg) --------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + deterministic top-k (sort/limit, SURVEY §2.6)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .where(F.col("o_orderstatus") != "F")
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return rev.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(10)


# --- broadcast join chain (J1 generalized) ----------------------------------

def q_supplier_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )


# --- semi / anti joins (J2/P3 generalized) ----------------------------------

def q_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join — restricted to 'F' orders so the result is non-empty
    (every customer has SOME order in the synthetic data, which would
    make the check vacuous)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization in batch: 30-min-gap sessions per user via
    lag + conditional cumsum over an ordered window — the classic
    pattern, fully oracle-able."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
    marked = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    sessions = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("long")
        .alias("duration_s"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.max("duration_s").cast("long").alias("max_duration_s"),
    )


# --- window functions (SURVEY §2.5) ------------------------------------------

def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("rn").cast("long").alias("rn"),
            F.round("o_totalprice", 2).alias("price"),
        )
    )


def q_order_price_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + running aggregate over an ordered partition frame."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
        F.count(F.lit(1)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long").alias("order_seq"),
    )


# --- time windows over events -------------------------------------------------

def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            "event_type", F.window("ts", "1 hour").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        )
        .select(
            "event_type",
            F.unix_timestamp("w.start").cast("long").alias("hour_start"),
            "n",
            "sum_value",
        )
    )


def q_events_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.avg("value"), 5).alias("avg_value"),
            F.round(
                F.percentile_approx("value", 0.5, 10000), 3
            ).alias("median_approx"),
        )
        .drop("median_approx")  # approx percentile: not oracle-stable
    )


def q_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — subtotals + grand total in one pass."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


def q_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation) per group."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
    )


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type averages as columns (fixed key list —
    at scale you always pass the values to avoid a discovery pass)."""
    e = _t(spark, sf_dir, "events")
    types = ["click", "view", "purchase"]
    # sums, not averages: an average is a repeating decimal that can sit
    # exactly on a rounding-half boundary where Spark (HALF_UP) and
    # DuckDB (half-even) disagree; sums of the data's fixed-precision
    # values stay far from boundaries
    return (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.round(F.sum("value"), 4).alias("s"), F.count("value").alias("n"))
        .select(
            "user_id",
            *[F.col(f"{t}_s").alias(f"sum_{t}") for t in types],
            # empty pivot cell: Spark yields null, DuckDB count FILTER
            # yields 0 — coalesce to 0
            *[
                F.coalesce(F.col(f"{t}_n"), F.lit(0)).cast("long").alias(f"n_{t}")
                for t in types
            ],
        )
    )


# --- set operations (SURVEY §2.7) ---------------------------------------------

def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return spark.createDataFrame(
        [
            (
                a.union(b).distinct().count(),
                a.intersect(b).count(),  # INTERSECT DISTINCT semantics
                a.subtract(b).count(),  # EXCEPT DISTINCT semantics
            )
        ],
        "n_union long, n_intersect long, n_except long",
    )


# --- explode / array (UDTF analog, SURVEY §2.10) -------------------------------

def q_orders_per_priority_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode + re-aggregate (the explode(all_domains) shape)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(F.explode(F.split("o_orderpriority", "-")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (see operators/compact.py): a
    per-(event_type, hour) sink-file inventory greedily bin-packed
    into ~4 KB merge groups per key.  Plan shape: one hash agg for the
    inventory, then window arithmetic partitioned by sink key — no
    joins, no driver loop, bounded exchanges."""
    from rxtls_spark.operators.compact import compaction_plan, file_inventory

    inv = file_inventory(_t(spark, sf_dir, "events"))
    return compaction_plan(inv, target_bytes=4096)


# --- as-of / range / skew joins (SURVEY §2.3 "provided by Spark built-ins" --
# row: the reference has only broadcast equi-joins; these cover the join
# shapes a web-scale training pipeline needs beyond that).

def _us(col: str):
    """Microsecond epoch of a TIMESTAMP_NTZ column.  The session TZ is
    pinned to UTC (session.py), so the NTZ->TZ cast is a pure
    reinterpretation and matches DuckDB's epoch_us() on the same NTZ
    value (unix_micros itself rejects NTZ input)."""
    return F.unix_micros(F.col(col).cast("timestamp"))

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every 'click' event, the same user's most recent
    'view' event at-or-before the click (and the gap in microseconds).

    Scale path: the MERGE as-of — union both sides tagged, ONE shuffle
    on user_id, then last(..., ignorenulls) over an ordered rows-frame.
    No join node at all, so no row explosion and no skew amplification:
    a join-then-filter as-of is O(clicks x views per user) at 10^12
    rows; this is O(clicks + views) with a single exchange.  Ordering
    (ts_us, side) puts the view BEFORE a click at the identical
    timestamp, matching the oracle's `c.ts >= v.ts`; the build side is
    deduped per (user_id, ts) -> max event_id so equal-time ties are
    deterministic on both engines.  Oracle: DuckDB's native ASOF LEFT
    JOIN over the identical deduped build side.
    """
    ev = _t(spark, sf_dir, "events")
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("b_eid"))
        .select(
            "user_id",
            _us("ts").alias("t_us"),
            F.lit(0).alias("side"),
            "b_eid",
            _us("ts").alias("b_t_us"),
            F.lit(None).cast("long").alias("event_id"),
        )
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        _us("ts").alias("t_us"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("b_eid"),
        F.lit(None).cast("long").alias("b_t_us"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = views.unionByName(clicks).select(
        "*",
        F.last("b_eid", ignorenulls=True).over(w).alias("view_event_id"),
        F.last("b_t_us", ignorenulls=True).over(w).alias("view_t_us"),
    )
    return merged.where(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.col("t_us").alias("ts_us"),
        "view_event_id",
        (F.col("t_us") - F.col("view_t_us")).alias("gap_us"),
    )


# Administrative follow-up cap (days) — MIRRORED in the
# `rel_survival_table` oracle SQL; change together.  Conversions past
# the cap are right-censored AT the cap (equal-follow-up design).
SURV_CAP_DAYS = 3


def q_rel_survival_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier life table for signup→purchase conversion — the
    survival-analysis deliverable a product/log pipeline publishes
    (time-to-convert with RIGHT CENSORING: users who have not
    converted by the end of follow-up are not dropped, they are
    censored — dropping them is the classic conversion-rate bias).
    One row per day offset t: users still at risk, conversions d,
    and censorings c; S(t) = Π(1 − d/n_risk) derives downstream.

    Semantics: per user, start = FIRST signup event, conversion = the
    first purchase AT-or-after it; delay days via truncating DIV on
    epoch µs; ADMINISTRATIVE censoring at ``SURV_CAP_DAYS`` of
    follow-up (the every-cohort-gets-equal-follow-up design) AND at
    the log's global max ts, whichever ends follow-up first — so
    both branches are real at every scale.  n_risk(t) =
    Σ_{s>=t}(d_s + c_s) — a reverse cumulative sum over the bounded
    day-offset table.  All BIGINT.

    Scale path: two event-type filters → per-user min/conditional-min
    in ONE user_id hash agg; the life table is a bounded (≤ horizon
    days) agg + one window over those bounded rows."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", _us("ts").alias("t_us")
    )
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "signup", F.col("t_us"))
            ).alias("signup_us"),
        )
        .where(F.col("signup_us").isNotNull())
        .select("user_id", "signup_us")
    )
    first_purchase = (
        ev.where(F.col("event_type") == "purchase")
        .join(per_user, "user_id")
        .where(F.col("t_us") >= F.col("signup_us"))
        .groupBy("user_id")
        .agg(F.min("t_us").alias("purchase_us"))
    )
    obs_end = ev.agg(F.max("t_us").alias("end_us"))
    delay = F.expr("(purchase_us - signup_us) DIV 86400000000")
    cens = F.expr(
        f"least((end_us - signup_us) DIV 86400000000,"
        f" CAST({SURV_CAP_DAYS} AS BIGINT))"
    )
    converted = F.col("purchase_us").isNotNull() & (delay <= cens)
    timed = (
        per_user.join(first_purchase, "user_id", "left")
        .crossJoin(F.broadcast(obs_end))
        .select(
            F.when(converted, delay).otherwise(cens).cast("long").alias("t"),
            converted.cast("long").alias("is_event"),
        )
    )
    table = timed.groupBy("t").agg(
        F.sum("is_event").cast("long").alias("d"),
        F.sum(1 - F.col("is_event")).cast("long").alias("c"),
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return table.select(
        "t",
        "d",
        "c",
        F.sum(F.col("d") + F.col("c")).over(w).cast("long").alias("n_risk"),
    )


# Burst gap threshold (µs) — MIRRORED in the `rel_burstiness` oracle
# SQL; change together.  Gap stats are in SECONDS (truncating DIV) so
# the squared sums stay < 2^63 at any realistic event horizon.  10
# minutes = "rapid-fire" at the synthetic log's event density (its
# median inter-arrival is ~7 h; real clickstreams would set ~1 s).
BURST_GAP_US = 600_000_000


def q_rel_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival burstiness profile per user — the bot/scraper
    detection signal a log pipeline computes before rate-limiting or
    corpus inclusion: humans produce heavy-tailed inter-event gaps,
    automation produces metronomic or rapid-fire ones.  Emits per
    user the exact integer moments of the gap distribution (count,
    sum, sum of squares, max — CV and dispersion derive downstream)
    plus the sub-second burst count.

    Cross-engine: gaps from one lag window ordered by (ts, event_id);
    gap seconds via truncating DIV (non-negative, so Spark DIV ==
    DuckDB //); all outputs BIGINT — exact.

    Scale path: ONE shuffle on user_id drives the lag window and the
    per-user agg (same partitioning, no second exchange)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", _us("ts").alias("t_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    gaps = ev.select(
        "user_id",
        (F.col("t_us") - F.lag("t_us").over(w)).alias("gap_us"),
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count("gap_us").cast("long").alias("n_gaps"),
        F.sum(F.expr("gap_us DIV 1000000")).cast("long").alias("sum_gap_s"),
        F.sum(
            F.expr("(gap_us DIV 1000000) * (gap_us DIV 1000000)")
        )
        .cast("long")
        .alias("sum_gap2_s"),
        F.max(F.expr("gap_us DIV 1000000")).cast("long").alias("max_gap_s"),
        F.sum(
            F.when(F.col("gap_us") < BURST_GAP_US, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_bursts"),
    )


def q_rel_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test harness, calibrated as an A/A test —
    the experimentation-platform primitive a log pipeline ships with
    its metrics: events split deterministically into arms by knuth
    parity (assignment ⊥ behavior — a NULL split), the metric is the
    purchase share, and the output is one row with per-arm counts,
    exact permille rates, and the pooled two-proportion z statistic.
    On a null split |z| must be modest — the standard A/A / sample-
    ratio-mismatch calibration an experiment pipeline runs before
    trusting any real flag (a per-user metric is degenerate on the
    synthetic log — every user purchases — so the event-level share
    is the non-trivial proportion at every SF).

    Cross-engine: counts and permilles are pure BIGINT; z is the ONE
    explicitly-ordered float expression (the kn_bigram_score rule —
    sqrt and each division written identically on both engines) then
    e3-floored; the floor absorbs any last-ulp drift.

    Scale path: a pure map then one 1-row agg; no window, no join,
    no shuffle beyond the partial-agg exchange."""
    from rxtls_spark.functions.hashing import knuth_hash

    ev = _t(spark, sf_dir, "events")
    arms = ev.select(
        (knuth_hash(F.col("event_id")) % 2).alias("arm"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("conv"),
    )
    agg = arms.groupBy().agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    z = (
        "((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) / "
        "sqrt((CAST(ca + cb AS DOUBLE) / (na + nb)) * "
        "(1.0 - CAST(ca + cb AS DOUBLE) / (na + nb)) * "
        "(1.0 / na + 1.0 / nb)))"
    )
    return agg.select(
        "na",
        "ca",
        "nb",
        "cb",
        F.expr("(ca * 1000) DIV na").alias("pa_permille"),
        F.expr("(cb * 1000) DIV nb").alias("pb_permille"),
        F.expr(f"CAST(floor({z} * 1000) AS BIGINT)").alias("z_e3"),
    )


def q_rel_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining over the event log: for every
    unordered pair of event types co-occurring in a user's history,
    the support count, both conditional confidences, and the PMI-form
    lift — the co-behavior table product analytics derives next-action
    rules and anomaly baselines from.

    Cross-engine: supports/confidences are pure BIGINT (truncating
    DIV); lift_e3 = floor(ln((n_ab·N)/(n_a·n_b))·1e3) with EVERY
    operand cast DOUBLE before multiplying (the source_keyness rule —
    BIGINT products would overflow at 10^12-user scale).

    Scale path: the (user, type) distinct is one hash agg; the pair
    self-join keys on user_id (co-partitioned; fan-out bounded by K²
    per user for K event types); the pair agg lands on ≤K² keys —
    metadata scale."""
    ev = _t(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n_users = ut.select("user_id").distinct().count()
    singles = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_t")
    )
    b = ut.select(
        "user_id", F.col("event_type").alias("type_b")
    )
    pairs = (
        ut.join(b, "user_id")
        .where(F.col("event_type") < F.col("type_b"))
        .groupBy(
            F.col("event_type").alias("type_a"), "type_b"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b")
    )
    out = pairs.join(F.broadcast(sa), "type_a").join(
        F.broadcast(sb), "type_b"
    )
    lift = (
        f"floor(ln((CAST(n_ab AS DOUBLE) * CAST({n_users} AS DOUBLE)) / "
        f"(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) * 1000)"
    )
    return out.select(
        "type_a",
        "type_b",
        "n_ab",
        "n_a",
        "n_b",
        F.expr("(n_ab * 1000) DIV n_a").alias("conf_a_permille"),
        F.expr("(n_ab * 1000) DIV n_b").alias("conf_b_permille"),
        F.expr(f"CAST({lift} AS BIGINT)").alias("lift_e3"),
    )


def q_rel_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × day-of-week traffic profile — the seasonality
    baseline a log pipeline maintains for capacity planning and
    anomaly detection (rel_hourly_anomalies flags deviations; this is
    the profile they deviate FROM).  Emits per (dow, hour) cell the
    event count, the e6 share, and the peak flag.

    Cross-engine: dow/hour come from pure integer epoch math —
    (epoch DIV 86400 + 4) % 7 (1970-01-01 was a Thursday; 0 = Sunday)
    and (epoch % 86400) DIV 3600 — NEVER the engines' dayofweek()
    (Spark is 1-based Sunday, DuckDB 0-based; the integer form
    sidesteps the convention entirely); epochs are floor-truncated
    seconds (the rel_event_sessions rule).

    Scale path: one pure map + ONE ≤168-key hash agg; the share/peak
    windows run over the 168-row profile — metadata scale."""
    ev = _t(spark, sf_dir, "events").select(
        F.unix_timestamp("ts").alias("es")
    )
    b = ev.select(
        F.expr("(es DIV 86400 + 4) % 7").cast("long").alias("dow"),
        F.expr("(es % 86400) DIV 3600").cast("long").alias("hour"),
    ).groupBy("dow", "hour").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    w = Window.partitionBy()
    return b.select(
        "dow",
        "hour",
        "n_events",
        F.sum("n_events").over(w).cast("long").alias("_tot"),
        F.max("n_events").over(w).cast("long").alias("_mx"),
    ).select(
        "dow",
        "hour",
        "n_events",
        F.expr("(n_events * 1000000) DIV _tot").alias("share_e6"),
        F.when(F.col("n_events") == F.col("_mx"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_peak"),
    )


def q_rel_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted daily traffic baseline per event type —
    the online forecast a log pipeline keeps next to the seasonality
    profile (rel_seasonality is the static shape; this is the adaptive
    level that tracks drift): per (event_type, day), the raw count,
    the integer EWMA level s_t = (3·s_{t−1} + 1000·n_t) DIV 4
    (α = 1/4, e3-scaled so truncation noise stays 3 decimal digits
    down), the signed forecast error, and a spike flag
    (2·1000·n > 3·s — count exceeds 1.5× the smoothed level; CASE
    mirrored).

    Cross-engine: the recurrence is a pure BIGINT fold — Spark runs it
    as an `aggregate()` fold over the array_sort'ed per-type day
    series (the rel_hourly_anomalies bounded-fold discipline), DuckDB
    as a WITH RECURSIVE chain over rn; both truncate DIV on positive
    operands, so every s_e3 is bit-identical.  Days are
    floor-truncated epoch DIV 86400 (the rel_seasonality rule).

    Scale path: ONE corpus-scale hash agg onto (type × day) — bounded
    by types·horizon (metadata-scale at any event volume); the fold
    runs per type over that bounded series, never over raw events."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type"),
        F.expr("unix_timestamp(ts) DIV 86400").cast("long").alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ser = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "n"))).alias("xs")
    )
    folded = ser.select(
        "event_type",
        F.expr(
            "aggregate(xs,"
            " CAST(array() AS array<struct<day:bigint,n:bigint,s_e3:bigint>>),"
            " (acc, x) -> concat(acc, array(named_struct("
            "   'day', x.day, 'n', x.n, 's_e3',"
            "   CASE WHEN size(acc) = 0 THEN x.n * 1000"
            "        ELSE (3 * element_at(acc, -1).s_e3 + 1000 * x.n) DIV 4"
            "   END))))"
        ).alias("ys"),
    )
    y = folded.select("event_type", F.explode("ys").alias("y"))
    return y.select(
        "event_type",
        F.col("y.day").alias("day"),
        F.col("y.n").alias("n_events"),
        F.col("y.s_e3").alias("ewma_e3"),
        (F.col("y.n") * 1000 - F.col("y.s_e3")).cast("long").alias(
            "err_e3"
        ),
        F.when(F.col("y.n") * 2000 > 3 * F.col("y.s_e3"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_spike"),
    )


def q_rel_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the behavioral model a log pipeline fits for
    next-action prediction, anomaly scoring (improbable paths), and
    funnel design (which step actually follows which): for every
    (prev_type → next_type) pair, the transition count and the exact
    permille transition probability, with the synthetic start state
    '^' so first events are modeled too (Σ over next of
    p(next | '^') ≈ the landing distribution).

    Cross-engine: ONE lag window ordered by (ts, event_id) per user
    (the burstiness/SCD2 ordering rule); p_permille =
    (n_trans·1000) DIV n_prev — non-negative truncating DIV, exact
    BIGINT at any event horizon (n_trans·1000 < 2^63 to ~10^15
    events).

    Scale path: ONE shuffle on user_id drives the lag window; the
    transition agg lands on ≤(K+1)·K keys for K event types —
    metadata scale, so the row-count window over it is free."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.coalesce(F.lag("event_type").over(w), F.lit("^")).alias(
            "prev_type"
        ),
        F.col("event_type").alias("next_type"),
    )
    cnt = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_trans")
    )
    wp = Window.partitionBy("prev_type")
    return cnt.withColumn(
        "n_prev", F.sum("n_trans").over(wp).cast("long")
    ).select(
        "prev_type",
        "next_type",
        "n_trans",
        "n_prev",
        F.expr("(n_trans * 1000) DIV n_prev").alias("p_permille"),
    )


def q_rel_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (SCD type 2) history build over the
    event log: per user, the validity intervals of their CURRENT
    event_type state — each run of consecutive same-type events
    becomes one dimension row with valid_from / valid_to (NULL = the
    open current row), the standard warehouse change-tracking shape
    (`rel_log_compaction` keeps only the latest row; SCD2 keeps the
    full history with intervals).

    Semantics: events ordered per user by (ts, event_id); a change
    point is event_type <> lag(event_type); islands via the cumulative
    change count (gaps-and-islands, the rel_event_sessions trick);
    valid_to = the NEXT island's valid_from.

    Scale path: ONE shuffle on user_id drives all three windows (lag,
    cumulative sum, lead — same partitioning, Catalyst reuses the
    sort); the island agg is a hash agg on (user, island).  The
    oracle mirrors the identical window chain in DuckDB."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        _us("ts").alias("t_us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    marked = ev.select(
        "*",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    ).select(
        "*",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("island"),
    )
    runs = marked.groupBy("user_id", "island").agg(
        # all rows in an island share event_type by construction
        F.min("event_type").alias("event_type"),
        F.min("t_us").cast("long").alias("valid_from_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("island")
    return runs.select(
        "user_id",
        F.col("island").alias("seq"),
        "event_type",
        "valid_from_us",
        F.lead("valid_from_us").over(w2).cast("long").alias("valid_to_us"),
        "n_events",
    )


def q_rel_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity / data-quality audit over the warehouse
    tables — the DQ gate every ingest pipeline runs before publishing
    a snapshot: orphan foreign keys (order→customer,
    lineitem→order, customer→nation), primary-key duplication, and
    domain violations (non-positive prices, negative balances).
    One row per check: (check, n_bad, n_total).

    Scale path: each FK check is a LEFT ANTI join keyed on the FK —
    the dimension sides (customer, nation) broadcast; the
    lineitem→orders anti-join shuffles on the join key exactly once;
    PK duplication is one hash agg over keys; domain checks are pure
    maps.  The union is a 6-row metadata frame.

    Reference analog: P1/P4 usability filtering (the reference drops
    unusable log entries before processing — this is the same gate
    generalized to relational constraints)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    nation = _t(spark, sf_dir, "nation")

    checks = []
    orphan_orders = orders.join(
        F.broadcast(cust.select("c_custkey")),
        orders["o_custkey"] == cust["c_custkey"],
        "left_anti",
    )
    checks.append(
        orphan_orders.agg(
            F.lit("orphan_orders").alias("check"),
            F.count(F.lit(1)).cast("long").alias("n_bad"),
        ).crossJoin(
            orders.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
        )
    )
    orphan_li = li.join(
        orders.select("o_orderkey"),
        li["l_orderkey"] == orders["o_orderkey"],
        "left_anti",
    )
    checks.append(
        orphan_li.agg(
            F.lit("orphan_lineitems").alias("check"),
            F.count(F.lit(1)).cast("long").alias("n_bad"),
        ).crossJoin(
            li.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
        )
    )
    orphan_cust = cust.join(
        F.broadcast(nation.select("n_nationkey")),
        cust["c_nationkey"] == nation["n_nationkey"],
        "left_anti",
    )
    checks.append(
        orphan_cust.agg(
            F.lit("orphan_customers").alias("check"),
            F.count(F.lit(1)).cast("long").alias("n_bad"),
        ).crossJoin(
            cust.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
        )
    )
    dup_keys = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
    )
    checks.append(
        dup_keys.agg(
            F.lit("dup_orderkeys").alias("check"),
            F.count(F.lit(1)).cast("long").alias("n_bad"),
        ).crossJoin(
            orders.agg(
                F.countDistinct("o_orderkey").cast("long").alias("n_total")
            )
        )
    )
    checks.append(
        orders.agg(
            F.lit("nonpositive_price").alias("check"),
            F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
            .cast("long")
            .alias("n_bad"),
        ).crossJoin(
            orders.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
        )
    )
    checks.append(
        cust.agg(
            F.lit("negative_acctbal").alias("check"),
            F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_bad"),
        ).crossJoin(
            cust.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
        )
    )
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def q_rel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion attribution over the event log: every 'purchase'
    event is credited to the same user's FIRST and LAST touch event
    (any non-purchase type) at-or-before the purchase — the
    first-touch/last-touch report every marketing/log pipeline ships,
    and the natural companion of `rel_event_funnel` (which counts
    stage reach; this allocates conversion credit and revenue).

    Semantics: touch rule ts <= conversion ts; ties broken by
    (ts, event_id) — last = argmax, first = argmin; conversions with
    no prior touch land in the 'none' bucket.  Output is one row per
    (kind ∈ {first, last}, touch_type): conversion count + attributed
    revenue.

    Scale path: the MERGE as-of (the rel_asof_join shape) doubled —
    union touches + conversions tagged, ONE shuffle on user_id, then
    running last(ignorenulls) AND first(ignorenulls) over the same
    ordered rows-frame in one Window; no join node, O(events) not
    O(convs × touches per user).  The oracle is the
    join-then-rank formulation — fine at sf0.01 and exactly what
    would be wrong at 100 TB."""
    ev = _t(spark, sf_dir, "events")
    touches = ev.where(F.col("event_type") != "purchase").select(
        "user_id",
        _us("ts").alias("t_us"),
        F.lit(0).alias("side"),
        "event_id",
        F.col("event_type").alias("b_type"),
        F.lit(None).cast("double").alias("value"),
    )
    convs = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        _us("ts").alias("t_us"),
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("string").alias("b_type"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = touches.unionByName(convs).select(
        "side",
        "value",
        F.last("b_type", ignorenulls=True).over(w).alias("lt"),
        F.first("b_type", ignorenulls=True).over(w).alias("ft"),
    )
    conv_rows = merged.where(F.col("side") == 1).select(
        F.coalesce("lt", F.lit("none")).alias("lt"),
        F.coalesce("ft", F.lit("none")).alias("ft"),
        "value",
    )
    both = conv_rows.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("last").alias("kind"),
                    F.col("lt").alias("touch_type"),
                ),
                F.struct(
                    F.lit("first").alias("kind"),
                    F.col("ft").alias("touch_type"),
                ),
            )
        ).alias("k"),
        "value",
    )
    return both.groupBy(
        F.col("k.kind").alias("kind"),
        F.col("k.touch_type").alias("touch_type"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_conv"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


# Price-band dimension for the range join: (band, lo, hi) half-open
# intervals.  The last band is open-ended so out-of-range prices at
# other SFs still land somewhere (total row count is then invariant).
RANGE_BANDS: list[tuple[str, float, float]] = [
    ("band_0", 0.0, 920.0),
    ("band_1", 920.0, 940.0),
    ("band_2", 940.0, 960.0),
    ("band_3", 960.0, 980.0),
    ("band_4", 980.0, 1.0e18),
]


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join: parts bucketed into price bands by
    lo <= p_retailprice < hi against a broadcast interval dimension.

    Scale path: the dim side is tiny and broadcast, so the non-equi
    predicate plans as BroadcastNestedLoopJoin — each part row scans 5
    broadcast intervals, zero shuffle on the fact side before the
    final agg.  (A large-large range join would instead bucket both
    sides by floor(price/width) and equi-join the bucket key; the
    bands here are the broadcastable case.)
    """
    part = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        RANGE_BANDS, "band string, lo double, hi double"
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("p_retailprice"), 2).alias("sum_retail"),
        )
    )


SKEW_NSALT = 8  # mirrored in the rel_skew_salted_join pytest lock


def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join: orders x customer where the customer side is
    exploded into SKEW_NSALT salted replicas and the orders side picks
    a deterministic salt (o_orderkey % NSALT), so ONE hot c_custkey
    spreads over NSALT shuffle partitions instead of melting a single
    reducer.  The oracle is the PLAIN join — salting must be invisible
    in the result (tests/test_relational_joins.py also locks salted ==
    unsalted bit-for-bit).  At 10^12 rows this is the manual fallback
    when AQE skew-join can't kick in (e.g. the skew is inside one
    partition of a broadcast-ineligible dim).
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    c_salted = c.select(
        "c_custkey",
        "c_mktsegment",
        F.explode(F.array(*[F.lit(i) for i in range(SKEW_NSALT)])).alias("salt"),
    )
    o_salted = o.withColumn(
        "salt", (F.col("o_orderkey") % SKEW_NSALT).cast("int")
    )
    return (
        o_salted.join(
            c_salted,
            (o_salted.o_custkey == c_salted.c_custkey)
            & (o_salted.salt == c_salted.salt),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (overlapping) time windows: 2-hour windows sliding every
    hour — each event lands in exactly two windows.  Spark's window()
    with a slide plans as a generator (explode of the window set) +
    one hash agg; the oracle reproduces the window assignment as a
    2-row offset cross join.  Window starts are epoch-aligned on both
    engines (Spark aligns to 1970-01-01 by default)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# Funnel stage order — MIRRORED in the `rel_event_funnel` oracle SQL;
# change together.  Stage k's timestamp is the min event time of its
# type AT OR AFTER stage k-1's timestamp within the same 30-min
# session (>= not >: epochs are floor-seconds, so same-second
# signup→click must count).
FUNNEL_STAGES = ("signup", "click", "purchase")


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel within 30-min sessions:
    signup → click → purchase, the classic product-analytics query a
    log pipeline serves.  Composes the proven sessionization (lag +
    conditional cumsum) with CHAINED conditional-min windows — stage
    k+1's timestamp is min(es of its type with es >= stage k's), so
    out-of-order events can't fake a conversion, and a missing stage
    nulls every later stage (NULL comparison propagates).

    Scale shape: join-free.  The session window hash-partitions by
    user_id; every later window and the per-session agg key on
    (user_id, session_id) — a SUPERSET of the partitioning keys, so
    Spark reuses the exchange (subset-satisfies-ClusteredDistribution)
    and the whole funnel is ONE corpus shuffle + a 3-row rollup
    (plan-locked: 0 joins)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
    sess = (
        e.withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .select(
            "user_id",
            "session_id",
            "event_type",
            F.unix_timestamp("ts").alias("es"),
        )
    )
    ws = Window.partitionBy("user_id", "session_id")

    def stage_min(stage: str, after: F.Column | None) -> F.Column:
        cond = F.col("event_type") == stage
        if after is not None:
            cond = cond & (F.col("es") >= after)  # null after → null cond
        return F.min(F.when(cond, F.col("es"))).over(ws)

    staged = sess.withColumn("t1", stage_min(FUNNEL_STAGES[0], None))
    staged = staged.withColumn(
        "t2", stage_min(FUNNEL_STAGES[1], F.col("t1"))
    )
    staged = staged.withColumn(
        "t3", stage_min(FUNNEL_STAGES[2], F.col("t2"))
    )
    per_session = staged.groupBy("user_id", "session_id").agg(
        F.max("t1").alias("t1"),  # constant within the session
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    stages = (
        per_session.where(F.col("t1").isNotNull())
        .select("user_id", F.lit("1_" + FUNNEL_STAGES[0]).alias("stage"))
        .unionByName(
            per_session.where(F.col("t2").isNotNull()).select(
                "user_id", F.lit("2_" + FUNNEL_STAGES[1]).alias("stage")
            )
        )
        .unionByName(
            per_session.where(F.col("t3").isNotNull()).select(
                "user_id", F.lit("3_" + FUNNEL_STAGES[2]).alias("stage")
            )
        )
    )
    return stages.groupBy("stage").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


def q_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly scores over hourly event rates — the monitoring
    alarm a log pipeline runs on itself: per event type, the
    median/MAD z-score of each hour's count (median-based so a burst
    can't drag its own baseline, unlike mean/stddev).  Exact integers
    throughout via the doubled-median trick: med2 = 2·median(c) is the
    one-or-two middle values summed (row_number against (n+1)÷2 and
    (n+2)÷2 — the middle row counts twice when n is odd), dev2 =
    |2c − med2| = 2·|c − med|, mad4 = 2·median(dev2) = 4·MAD, and
    z_e3 = (2c−med2)·2000 ÷ mad4 = 1000·(c−med)/MAD — both engines
    truncate integer division toward zero, so the quotient matches.

    Scale shape: ONE corpus-scale hash agg (the hourly counts); the
    median/MAD windows run over (event_type × hours) — metadata-scale,
    and partitioned by type so no global sort."""
    e = _t(spark, sf_dir, "events")
    hours = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    wt = Window.partitionBy("event_type")
    lo = F.expr("(n + 1) DIV 2")
    hi = F.expr("(n + 2) DIV 2")
    mid = lambda rn: (  # noqa: E731 — middle-row indicator (1 or 2 hits)
        (rn == lo).cast("long") + (rn == hi).cast("long")
    )
    r = (
        hours.withColumn("n", F.count(F.lit(1)).over(wt).cast("long"))
        .withColumn(
            "rn",
            F.row_number()
            .over(Window.partitionBy("event_type").orderBy("c", "hr"))
            .cast("long"),
        )
    )
    m = r.withColumn(
        "med2", F.sum(F.col("c") * mid(F.col("rn"))).over(wt).cast("long")
    ).withColumn("dev2", F.abs(2 * F.col("c") - F.col("med2")))
    m2 = m.withColumn(
        "rn2",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("dev2", "hr"))
        .cast("long"),
    ).withColumn(
        "mad4", F.sum(F.col("dev2") * mid(F.col("rn2"))).over(wt).cast("long")
    )
    return m2.select(
        "event_type",
        F.unix_timestamp("hr").cast("long").alias("hour_start"),
        "c",
        "med2",
        "mad4",
        F.expr(
            "((2 * c - med2) * 2000) DIV greatest(mad4, 1L)"
        ).alias("z_e3"),
    )


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the other classic product-analytics
    query (beside the funnel) a log pipeline serves: users grouped by
    first-activity day, then for each day-offset the count still
    active and the retention rate vs the cohort's size.  Day = epoch
    seconds DIV 86400 (Spark unix_timestamp floors to seconds; the
    oracle floors DuckDB's microsecond epoch to match).  All exact
    BIGINTs: n_cohort comes from the offset-0 row itself (every user
    is active on their own cohort day), pulled across the cohort with
    a metadata-scale window, and ret_permille is integer division.

    Scale shape: distinct (user, day) is ONE corpus-scale hash agg;
    the cohort-day window partitions by user_id (second exchange);
    the (cohort, offset) agg and the n_cohort window run over
    cohorts × offsets — metadata-scale.  No joins."""
    e = _t(spark, sf_dir, "events")
    days = (
        e.select(
            "user_id",
            F.expr("unix_timestamp(ts) DIV 86400").cast("long").alias("day"),
        )
        .distinct()
    )
    wu = Window.partitionBy("user_id")
    coh = days.withColumn("cohort_day", F.min("day").over(wu))
    agg = coh.groupBy(
        "cohort_day", (F.col("day") - F.col("cohort_day")).alias("offset_d")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    wc = Window.partitionBy("cohort_day")
    return agg.select(
        "cohort_day",
        "offset_d",
        "n_active",
        F.max(
            F.when(F.col("offset_d") == 0, F.col("n_active"))
        )
        .over(wc)
        .cast("long")
        .alias("n_cohort"),
    ).withColumn(
        "ret_permille", F.expr("(n_active * 1000) DIV n_cohort")
    )


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — the 6-table join-reordering showcase: revenue
    per nation from lineitems where the customer and the supplier sit
    in the SAME nation of one region.  The fact-table chain
    (customer→orders→lineitem→supplier) shuffles on its keys while
    nation/region ride broadcasts; the c_nationkey = s_nationkey
    equality is part of the supplier join condition (not a post-hoc
    filter), so Catalyst prunes supplier rows during the join.  This
    is the query class where declarative planning pays: the engine
    (CBO/AQE), not the author, picks the join order at 100 TB.

    Aggregate revenue rounds 2 dp — the aggregate-rounding class
    (sum-order ulp noise), never per-row."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        )
    )


def q_log_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key compaction — the Kafka-compaction / CDC
    "current state" view of an event log: for every user, the most
    recent event's attributes (by ts, event_id tie-break) plus the
    history depth being compacted away.  The struct-max trick does it
    in ONE hash agg — max over (es, event_id, ...) structs picks the
    lexicographically-latest record with NO window and NO self-join,
    the shape that survives 10^12-event logs (a window would sort
    every user's history; the agg is a map-side-combinable max).

    Exactness: epochs are floor-seconds BIGINTs; value rides the
    struct as its exact double and is emitted stable-rounded at 2 dp
    only for display parity with the other event queries."""
    e = _t(spark, sf_dir, "events")
    latest = F.max(
        F.struct(
            F.unix_timestamp("ts").cast("long").alias("es"),
            F.col("event_id").cast("long").alias("event_id"),
            F.col("event_type").alias("event_type"),
            F.col("value").alias("value"),
        )
    ).alias("last")
    return (
        e.groupBy("user_id")
        .agg(
            latest,
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select(
            "user_id",
            F.col("last.es").alias("last_es"),
            F.col("last.event_id").alias("last_event_id"),
            F.col("last.event_type").alias("last_event_type"),
            F.col("last.value").alias("last_value"),
            "n_events",
        )
    )


def q_rel_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily / 7-day rolling active users (DAU / WAU) + stickiness —
    the engagement headline every log pipeline publishes.  Exact
    rolling DISTINCT cannot ride a window function (distinct doesn't
    decompose over sliding frames); the scale shape is the bounded-day
    range join: dedup to (day, user) pairs once, broadcast the day
    list (≤ horizon days — metadata scale even over a decade), fan
    each pair to the ≤7 target days it covers map-side, and count
    distinct per target day.

    Cross-engine: day = es DIV 86400 on floor-seconds epochs (the
    rel_seasonality rule); stickiness_permille = (dau·1000) DIV wau —
    non-negative truncating DIV.

    Scale path: one (day, user) dedup shuffle + one (day, user)
    distinct agg after the broadcast fan-out — no global sort, no
    per-user window; at 10^12 events the pair table is the bound and
    both shuffles are on it."""
    ev = _t(spark, sf_dir, "events").select(
        F.expr("CAST(unix_timestamp(ts) AS BIGINT) DIV 86400").alias("day"),
        "user_id",
    )
    ud = ev.distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    tgt = days.select(F.col("day").alias("tday"))
    wau = (
        ud.join(
            F.broadcast(tgt),
            (F.col("day") >= F.col("tday") - F.lit(6))
            & (F.col("day") <= F.col("tday")),
        )
        .groupBy("tday")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
        .withColumnRenamed("tday", "day")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.expr("(dau * 1000) DIV wau").alias("stickiness_permille"),
        )
    )


def q_rel_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation over
    the purchase log — the classic customer-value partition a log
    pipeline feeds to marketing and churn models.  Per purchasing
    user: days since last purchase (anchored at the latest purchase in
    the log), purchase count, exact cent-sum spend, quintile scores
    1..5 per dimension, and the segment verdict (CASE order IS the
    semantics).

    Cross-engine exactness: cents = floor(value·100 + 0.5) per row
    (the round5_stable discipline — identical IEEE fold both engines),
    then exact BIGINT sums.  Quintiles NEVER use ntile/row_number over
    users (tie order would be engine-dependent, and a global sort of
    10^9 users is the anti-pattern the histogram gate replaced):
    min-rank comes from the BOUNDED metric histogram — rank(v) = 1 +
    Σ cnt[better buckets], score = 5 − (5·(rank−1)) DIV n — so tied
    users get identical scores by construction.  Monetary ranks over
    whole-dollar buckets (m_cents DIV 100) to keep that histogram
    bounded; recency buckets are days (≤ horizon), frequency buckets
    are counts.

    Scale path: ONE per-user hash agg, three bounded-histogram aggs
    with metadata-scale cum windows, three broadcast joins back —
    no corpus-wide sort or window anywhere."""
    p = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.unix_timestamp("ts").cast("long").alias("es"),
            F.expr(
                "CAST(floor(value * 100 + 0.5) AS BIGINT)"
            ).alias("cents"),
        )
    )
    u = p.groupBy("user_id").agg(
        F.expr("max(es) DIV 86400").alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("f"),
        F.sum("cents").cast("long").alias("m_cents"),
    )
    anchor = u.agg(F.max("last_day").alias("anchor_day"))
    m = u.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        (F.col("anchor_day") - F.col("last_day")).alias("r_days"),
        "f",
        "m_cents",
        F.expr("m_cents DIV 100").alias("m_b"),
    )

    def _cum(col: str, better_desc: bool) -> DataFrame:
        """Bounded histogram of `col` with the count of strictly-better
        buckets (better = smaller when better_desc is False)."""
        h = m.groupBy(F.col(col).alias("b")).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        order = F.col("b").desc() if better_desc else F.col("b").asc()
        w = (
            Window.orderBy(order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return h.select(
            "b",
            F.coalesce(F.sum("c").over(w), F.lit(0))
            .cast("long")
            .alias("better"),
        )

    n_row = m.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n"))
    hr = _cum("r_days", better_desc=False)
    hf = _cum("f", better_desc=True)
    hm = _cum("m_b", better_desc=True)
    scored = (
        m.join(F.broadcast(hr.withColumnRenamed("better", "rb")),
               m.r_days == hr.b).drop("b")
        .join(F.broadcast(hf.withColumnRenamed("better", "fb")),
              m.f == hf.b).drop("b")
        .join(F.broadcast(hm.withColumnRenamed("better", "mb")),
              m.m_b == hm.b).drop("b")
        .crossJoin(F.broadcast(n_row))
        .select(
            "user_id", "r_days", "f", "m_cents",
            F.expr("5 - (5 * rb) DIV n").alias("r_score"),
            F.expr("5 - (5 * fb) DIV n").alias("f_score"),
            F.expr("5 - (5 * mb) DIV n").alias("m_score"),
        )
    )
    return scored.withColumn(
        "segment",
        F.expr(
            "CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion' "
            "WHEN f_score >= 4 THEN 'loyal' "
            "WHEN r_score >= 4 AND f_score <= 2 THEN 'new' "
            "WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk' "
            "WHEN r_score <= 2 THEN 'hibernating' "
            "ELSE 'regular' END"
        ),
    )


def _benford_e6() -> list[tuple[int, int]]:
    """Benford first-digit expected shares floor(log10(1+1/d)·1e6),
    computed ONCE in Python and spliced into BOTH engines as integer
    literals (the _ndcg_weights rule — no engine log10 anywhere)."""
    import math

    return [
        (d, math.floor(math.log10(1.0 + 1.0 / d) * 1000000.0))
        for d in range(1, 10)
    ]


def q_rel_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals (Newcomb 1881 /
    Benford 1938; the fraud/synthetic-data screen auditors run on any
    financial column): per leading digit 1-9, observed count and e6
    share vs the spliced Benford expectation, the signed deviation,
    and a per-digit binomial z.  A generated or tampered price column
    shows flat digits (z ≫ 0 on 7-9, z ≪ 0 on 1); real multiplicative
    data tracks log10(1+1/d).

    Cross-engine: digit = first char of CAST(floor(price) AS BIGINT)
    — floor is bit-exact on doubles and BIGINT→string formatting
    agrees; counts/shares are BIGINT with truncating DIV; exp_e6 are
    Python-computed literals; z_e3 is an e3 floor over IEEE ÷/sqrt/×
    on exact doubles only (the graph_modularity bit-exact class —
    p = exp_e6/1e6 is one correctly-rounded division of exact values).

    Scale shape: one pure map → ONE 9-key hash agg; the share/total
    window runs over the 9-row profile — metadata scale.  Exact to
    ~9·10^12 orders (cnt·1e6 < 2^63)."""
    exp_case = " ".join(
        f"WHEN {d} THEN {e}" for d, e in _benford_e6()
    )
    ords = _t(spark, sf_dir, "orders").select(
        F.expr(
            "CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)"
            " AS STRING), 1, 1) AS BIGINT)"
        ).alias("digit")
    )
    b = ords.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    w = Window.partitionBy()
    return (
        b.select(
            "digit",
            "n_orders",
            F.sum("n_orders").over(w).cast("long").alias("_tot"),
        )
        .select(
            "digit",
            "n_orders",
            F.expr("(n_orders * 1000000) DIV _tot").alias("obs_e6"),
            F.expr(f"CAST(CASE digit {exp_case} END AS BIGINT)").alias(
                "exp_e6"
            ),
            F.col("_tot"),
        )
        .select(
            "digit",
            "n_orders",
            "obs_e6",
            "exp_e6",
            F.expr("CAST(obs_e6 - exp_e6 AS BIGINT)").alias("dev_e6"),
            F.expr(
                "CAST(floor((CAST(n_orders AS DOUBLE)"
                " - CAST(_tot AS DOUBLE) * (exp_e6 / 1000000.0))"
                " / sqrt(CAST(_tot AS DOUBLE) * (exp_e6 / 1000000.0)"
                " * (1.0 - exp_e6 / 1000000.0)) * 1000.0) AS BIGINT)"
            ).alias("z_e3"),
        )
    )


def _rel_benford_sql() -> str:
    """rel_benford_audit oracle: identical digit map, 9-key agg,
    spliced exp_e6 literals, and the bit-exact z expression."""
    exp_case = " ".join(f"WHEN {d} THEN {e}" for d, e in _benford_e6())
    return f"""
WITH d AS (
  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                             AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
), b AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n_orders FROM d GROUP BY 1
), t AS (
  SELECT digit, n_orders,
         CAST(sum(n_orders) OVER () AS BIGINT) AS _tot,
         CAST((n_orders * 1000000) // sum(n_orders) OVER () AS BIGINT)
           AS obs_e6,
         CAST(CASE digit {exp_case} END AS BIGINT) AS exp_e6
  FROM b
)
SELECT digit, n_orders, obs_e6, exp_e6,
       CAST(obs_e6 - exp_e6 AS BIGINT) AS dev_e6,
       CAST(floor((CAST(n_orders AS DOUBLE)
                   - CAST(_tot AS DOUBLE) * (exp_e6 / 1000000.0))
                  / sqrt(CAST(_tot AS DOUBLE) * (exp_e6 / 1000000.0)
                  * (1.0 - exp_e6 / 1000000.0)) * 1000.0) AS BIGINT)
         AS z_e3
FROM t
"""


# Path-trigram spec — MIRRORED in `_REL_PATH_TRIGRAMS_SQL`; change
# together.  Sessions are the rel_event_sessions 30-min spec (order by
# full ts + event_id — the micros rule); paths concatenate with '>',
# ranking (cnt DESC, path), top PATH_TOPK.
PATH_TOPK = 20


def q_rel_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top within-session event-type trigram paths — the sequential-
    pattern query between `rel_markov_transitions` (memoryless pairs)
    and full PrefixSpan mining: three-step behavioral paths with
    counts, the table a funnel designer reads to find the journeys
    nobody designed.  Sessions are the rel_event_sessions 30-min
    spec; paths stay within one session (a trigram never spans a
    session boundary — the two lags partition by (user, session)).

    Cross-engine: session ids via the per-user (ts, event_id) window
    cumsum; trigrams are lag-lag string concat with '>'; counts
    BIGINT; ranking (cnt DESC, path) fixed-k.

    Scale path: ONE per-user session window (the standard shard),
    two lags on the SAME window spec (one exchange reused), a hash
    agg onto the bounded type³ path space, fixed-k top-k."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type",
        F.unix_timestamp("ts").alias("es"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("es") - F.lag("es", 1).over(w)
    sess = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    tri = sess.select(
        F.concat_ws(
            ">",
            F.lag("event_type", 2).over(ws),
            F.lag("event_type", 1).over(ws),
            F.col("event_type"),
        ).alias("path"),
        F.lag("event_type", 2).over(ws).isNotNull().alias("full"),
    ).where(F.col("full"))
    return (
        tri.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), "path")
        .limit(PATH_TOPK)
        .select(
            "path",
            "cnt",
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), "path"))
            .cast("long")
            .alias("rank"),
        )
    )


_REL_PATH_TRIGRAMS_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
), s AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN es - lag(es) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) IS NULL
                OR es - lag(es) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM e
), sid AS (
  SELECT user_id, event_id, ts, event_type,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM s
), tri AS (
  SELECT lag(event_type, 2) OVER w AS a,
         lag(event_type, 1) OVER w AS b,
         event_type AS c
  FROM sid
  WINDOW w AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
), paths AS (
  SELECT a || '>' || b || '>' || c AS path, CAST(count(*) AS BIGINT) AS cnt
  FROM tri WHERE a IS NOT NULL GROUP BY 1
)
SELECT path, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, path) AS BIGINT) AS rank
FROM paths
ORDER BY cnt DESC, path LIMIT {PATH_TOPK}
"""


def q_rel_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the interval-overlap member
    of the relational family (as-of joins align points, scd2 builds
    intervals, sessions define them; this asks how many OVERLAP at
    once, the capacity-planning number an ops dashboard tracks):
    30-min-gap sessions (the `rel_event_sessions` spec verbatim),
    clipped to day boundaries, swept with the classic ±1 event line.

    Semantics: deltas (+1 at clip-start, −1 at clip-end+1) ordered
    (t, delta) ASC — ends process BEFORE starts at the same instant,
    so back-to-back sessions never double-count; the running sum uses
    the DEFAULT RANGE frame, so tied rows share one value and the
    within-tie order is irrelevant (the roc_auc frame rule — exact
    cross-engine without any extra tie-break); peak_t = earliest
    instant achieving the peak via the (cum DESC, t ASC) struct-max.
    All BIGINT.

    Scale shape: sessionize = the standard per-user window; the sweep
    windows partition by DAY (the daily-analytics shard — salt by
    (day, hour) first if one day's events outgrow an executor);
    per-day outputs."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", F.unix_timestamp("ts").alias("es")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("es") - F.lag("es", 1).over(w)
    sess = (
        e.withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("es").cast("long").alias("s"),
            F.max("es").cast("long").alias("e_end"),
        )
    )
    clipped = sess.select(
        "s",
        "e_end",
        F.explode(
            F.expr("sequence(s DIV 86400, e_end DIV 86400)")
        ).alias("day"),
    ).select(
        "day",
        F.expr("greatest(s, day * 86400)").alias("t0"),
        F.expr("least(e_end, day * 86400 + 86399)").alias("t1"),
    )
    deltas = clipped.select(
        "day", F.col("t0").alias("t"), F.lit(1).cast("long").alias("delta")
    ).unionAll(
        clipped.select(
            "day",
            (F.col("t1") + 1).alias("t"),
            F.lit(-1).cast("long").alias("delta"),
        )
    )
    wd = Window.partitionBy("day").orderBy("t", "delta")
    cum = deltas.withColumn("cum", F.sum("delta").over(wd).cast("long"))
    return (
        cum.groupBy("day")
        .agg(
            F.sum(F.expr("CASE WHEN delta = 1 THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_sessions"),
            F.max(F.struct(F.col("cum").alias("cum"), (-F.col("t")).alias("neg_t"))).alias("b"),
        )
        .select(
            "day",
            "n_sessions",
            F.col("b.cum").alias("peak"),
            (-F.col("b.neg_t")).cast("long").alias("peak_t"),
        )
    )


_REL_PEAK_CONCURRENCY_SQL = """
WITH e AS (
  SELECT user_id, event_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
), marked AS (
  SELECT user_id, event_id, ts, es,
         CASE WHEN lag(es) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) IS NULL
                OR es - lag(es) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM e
), sid AS (
  SELECT user_id, es,
         sum(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS session_id
  FROM marked
), sess AS (
  SELECT user_id, session_id,
         CAST(min(es) AS BIGINT) AS s,
         CAST(max(es) AS BIGINT) AS e_end
  FROM sid GROUP BY 1, 2
), clipped AS (
  SELECT day,
         CAST(greatest(s, day * 86400) AS BIGINT) AS t0,
         CAST(least(e_end, day * 86400 + 86399) AS BIGINT) AS t1
  FROM (
    SELECT s, e_end, unnest(generate_series(s // 86400, e_end // 86400))
             AS day
    FROM sess)
), deltas AS (
  SELECT day, t0 AS t, CAST(1 AS BIGINT) AS delta FROM clipped
  UNION ALL
  SELECT day, t1 + 1 AS t, CAST(-1 AS BIGINT) AS delta FROM clipped
), cum AS (
  SELECT day, t, delta,
         CAST(sum(delta) OVER (PARTITION BY day ORDER BY t, delta)
              AS BIGINT) AS cum
  FROM deltas
), best AS (
  SELECT day, t, cum,
         row_number() OVER (PARTITION BY day ORDER BY cum DESC, t) AS rn
  FROM cum
)
SELECT c.day,
       CAST(sum(CASE WHEN c.delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions,
       CAST(max(b.cum) AS BIGINT) AS peak,
       CAST(max(b.t) AS BIGINT) AS peak_t
FROM cum c JOIN best b ON c.day = b.day AND b.rn = 1
GROUP BY 1
"""


def q_rel_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing per event type (Holt 1957) —
    the LEVEL+TREND forecast that upgrades `rel_ewma_daily` (EWMA
    tracks level only, so it lags every ramp; Holt's trend term
    closes that lag, and `rel_trend_mk`/`rel_cusum_changepoint` are
    its hypothesis-test companions).  Per (type, day): count, the
    smoothed level, the smoothed trend, and the one-step forecast
    error 1000·n − (l+b).

    Semantics (α = β = 1/4, e3-scaled): l_1 = 1000·n_1, b_1 = 0;
    l_t = (1000·n_t + 3·(l+b)) DIV 4;
    b_t = ((l_t − l) + 3·b) DIV 4.

    Cross-engine: a pure BIGINT fold — Spark runs it as an
    aggregate() fold over the array_sort'ed per-type series (the
    rel_ewma_daily discipline), DuckDB as WITH RECURSIVE over rn;
    trend/error go NEGATIVE, which is safe because Spark DIV and
    DuckDB // both truncate toward zero (the zipf rule — Python
    replicas need trunc_div).

    Scale path: ONE corpus-scale hash agg onto (type × day); the
    fold runs over that bounded series only."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_timestamp(ts) DIV 86400").cast("long").alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ser = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "n"))).alias("xs")
    )
    folded = ser.select(
        "event_type",
        F.expr(
            "aggregate(xs,"
            " CAST(array() AS array<struct<day:bigint,n:bigint,"
            "l_e3:bigint,b_e3:bigint,err_e3:bigint>>),"
            " (acc, x) -> concat(acc, array("
            "  CASE WHEN size(acc) = 0 THEN named_struct("
            "   'day', x.day, 'n', x.n, 'l_e3', x.n * 1000,"
            "   'b_e3', CAST(0 AS BIGINT), 'err_e3', CAST(0 AS BIGINT))"
            "  ELSE named_struct("
            "   'day', x.day, 'n', x.n,"
            "   'l_e3', (1000 * x.n + 3 * (element_at(acc, -1).l_e3"
            "            + element_at(acc, -1).b_e3)) DIV 4,"
            "   'b_e3', (((1000 * x.n + 3 * (element_at(acc, -1).l_e3"
            "            + element_at(acc, -1).b_e3)) DIV 4)"
            "            - element_at(acc, -1).l_e3"
            "            + 3 * element_at(acc, -1).b_e3) DIV 4,"
            "   'err_e3', 1000 * x.n - (element_at(acc, -1).l_e3"
            "            + element_at(acc, -1).b_e3))"
            "  END)))"
        ).alias("ys"),
    )
    y = folded.select("event_type", F.explode("ys").alias("y"))
    return y.select(
        "event_type",
        F.col("y.day").alias("day"),
        F.col("y.n").alias("n_events"),
        F.col("y.l_e3").alias("level_e3"),
        F.col("y.b_e3").alias("trend_e3"),
        F.col("y.err_e3").alias("err_e3"),
    )


_REL_HOLT_SQL = """
WITH RECURSIVE e AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
), daily AS (
  SELECT event_type, CAST(day AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2
), ord AS (
  SELECT event_type, day, n,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM daily
), hw AS (
  SELECT event_type, day, n, rn, n * 1000 AS l_e3,
         CAST(0 AS BIGINT) AS b_e3, CAST(0 AS BIGINT) AS err_e3
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.event_type, o.day, o.n, o.rn,
         (1000 * o.n + 3 * (hw.l_e3 + hw.b_e3)) // 4,
         (((1000 * o.n + 3 * (hw.l_e3 + hw.b_e3)) // 4)
          - hw.l_e3 + 3 * hw.b_e3) // 4,
         1000 * o.n - (hw.l_e3 + hw.b_e3)
  FROM ord o JOIN hw
    ON o.event_type = hw.event_type AND o.rn = hw.rn + 1
)
SELECT event_type, day, n AS n_events,
       CAST(l_e3 AS BIGINT) AS level_e3,
       CAST(b_e3 AS BIGINT) AS trend_e3,
       CAST(err_e3 AS BIGINT) AS err_e3
FROM hw
"""


def q_rel_pvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume decomposition of revenue change per brand (the
    FP&A "PVM bridge"): between the log's first and second half
    (midpoint shipdate day), split each brand's ΔRevenue into a
    volume effect (quantity change at OLD average price) and a price
    effect (the remainder) — the two-term Laspeyres bridge whose sum
    is ΔR EXACTLY in rationals: vol = (qB−qA)·(rA/qA), price = rB −
    qB·(rA/qA), vol + price ≡ rB − rA.

    Cross-engine exact: quantities/prices quantize FIRST with
    floor(x+0.5) / floor(p·100+0.5) (the rel_price_corr rule — bare
    double casts diverge); the scaled integer forms (qB−qA)·rA and
    rB·qA − qB·rA live in DECIMAL(38,0) ↔ HUGEINT (≈1e28 at 100-TB
    brand volumes), and the emitted cent effects are their SIGNED
    truncating DIV by qA — so the residual ΔR − vol − price is the
    pure truncation remainder, |resid| ≤ 2 cents (the pytest lock;
    brands must have qA > 0 to appear).

    Scale path: broadcast part join, ONE (brand × period) hash agg,
    then metadata-scale arithmetic on |brands| rows."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("unix_timestamp(l_shipdate) DIV 86400")
        .cast("long")
        .alias("day"),
        F.expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").alias("q"),
        F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").alias(
            "r"
        ),
    )
    bounds = li.agg(
        F.expr("CAST((min(day) + max(day)) DIV 2 AS BIGINT)").alias("cut")
    )
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    per = (
        li.crossJoin(F.broadcast(bounds))
        .join(F.broadcast(part), "l_partkey")
        .groupBy("brand")
        .agg(
            F.sum(F.when(F.col("day") < F.col("cut"), F.col("q")).otherwise(0))
            .cast("long")
            .alias("q_a"),
            F.sum(F.when(F.col("day") >= F.col("cut"), F.col("q")).otherwise(0))
            .cast("long")
            .alias("q_b"),
            F.sum(F.when(F.col("day") < F.col("cut"), F.col("r")).otherwise(0))
            .cast("long")
            .alias("r_a"),
            F.sum(F.when(F.col("day") >= F.col("cut"), F.col("r")).otherwise(0))
            .cast("long")
            .alias("r_b"),
        )
        .where(F.col("q_a") > 0)
    )
    return per.selectExpr(
        "brand",
        "q_a",
        "q_b",
        "r_a",
        "r_b",
        "CAST((CAST(q_b AS DECIMAL(38,0)) - q_a) * r_a"
        " DIV CAST(q_a AS DECIMAL(38,0)) AS BIGINT) AS vol_eff_c",
        "CAST((CAST(r_b AS DECIMAL(38,0)) * q_a"
        " - CAST(q_b AS DECIMAL(38,0)) * r_a)"
        " DIV CAST(q_a AS DECIMAL(38,0)) AS BIGINT) AS price_eff_c",
        "CAST((r_b - r_a)"
        " - (CAST(q_b AS DECIMAL(38,0)) - q_a) * r_a"
        "   DIV CAST(q_a AS DECIMAL(38,0))"
        " - (CAST(r_b AS DECIMAL(38,0)) * q_a"
        "    - CAST(q_b AS DECIMAL(38,0)) * r_a)"
        "   DIV CAST(q_a AS DECIMAL(38,0)) AS BIGINT) AS resid_c",
    )


_REL_PVM_SQL = """
WITH li AS (
  SELECT l_partkey,
         CAST(floor(epoch(l_shipdate)) AS BIGINT) // 86400 AS day,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS r
  FROM lineitem
), bounds AS (
  SELECT CAST((min(day) + max(day)) // 2 AS BIGINT) AS cut FROM li
), per AS (
  SELECT p.p_brand AS brand,
         CAST(sum(CASE WHEN li.day < (SELECT cut FROM bounds)
                       THEN li.q ELSE 0 END) AS BIGINT) AS q_a,
         CAST(sum(CASE WHEN li.day >= (SELECT cut FROM bounds)
                       THEN li.q ELSE 0 END) AS BIGINT) AS q_b,
         CAST(sum(CASE WHEN li.day < (SELECT cut FROM bounds)
                       THEN li.r ELSE 0 END) AS BIGINT) AS r_a,
         CAST(sum(CASE WHEN li.day >= (SELECT cut FROM bounds)
                       THEN li.r ELSE 0 END) AS BIGINT) AS r_b
  FROM li JOIN part p ON li.l_partkey = p.p_partkey
  GROUP BY 1
)
SELECT brand, q_a, q_b, r_a, r_b,
       CAST((CAST(q_b AS HUGEINT) - q_a) * r_a
            // CAST(q_a AS HUGEINT) AS BIGINT) AS vol_eff_c,
       CAST((CAST(r_b AS HUGEINT) * q_a - CAST(q_b AS HUGEINT) * r_a)
            // CAST(q_a AS HUGEINT) AS BIGINT) AS price_eff_c,
       CAST((r_b - r_a)
            - (CAST(q_b AS HUGEINT) - q_a) * r_a // CAST(q_a AS HUGEINT)
            - (CAST(r_b AS HUGEINT) * q_a - CAST(q_b AS HUGEINT) * r_a)
              // CAST(q_a AS HUGEINT) AS BIGINT) AS resid_c
FROM per
WHERE q_a > 0
"""


def q_rel_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013) —
    the experimentation-platform workhorse that shrinks A/B variance
    using pre-period behavior as a control covariate: Y' = Y −
    θ·(X − X̄) with θ the OLS slope of post-metric Y on pre-metric X.
    Here X = each user's pre-period event count, Y = post-period
    purchase count (pre/post split at the log's midpoint day), and
    the output is the fitted θ, the achieved variance-reduction
    fraction, and ρ² — CUPED's theoretical ceiling (reduction = ρ²
    exactly when θ is unfloored; the e6 floor costs ≤ 1 ulp-class
    term, which the pytest locks).

    Cross-engine exact: per-user counts are BIGINTs; raw moments
    accumulate DECIMAL(38,0) ↔ HUGEINT; θ_e6 = signed
    ((n·Sxy−Sx·Sy)·1e6) DIV (n·Sxx−Sx²); the achieved reduction
    avoids any second data pass via the identity var(Y−cX) = var(Y)
    − 2c·cov + c²·var(X) — VA12 = varY·1e12 − 2θ_e6·cov·1e6 +
    θ_e6²·varX stays < 1e37 at 1e9 users × 1e3 counts; ρ² is the
    one-expression bit-exact IEEE double on the exact operands.

    Scale shape: one corpus-scale (user) hash agg, one 2-column
    bounds agg for the cutoff, one 1-row moments agg — no second
    pass, no driver data."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_timestamp(ts) DIV 86400").cast("long").alias("day"),
        F.when(F.col("event_type") == "purchase", F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_purchase"),
    )
    bounds = ev.agg(
        F.expr("CAST((min(day) + max(day)) DIV 2 AS BIGINT)").alias("cut")
    )
    u = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("day") < F.col("cut"), 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(
                    (F.col("day") >= F.col("cut"))
                    & (F.col("is_purchase") == 1),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
    )
    dec = "decimal(38,0)"
    m = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
    )
    return m.selectExpr(
        "CAST(n AS BIGINT) AS n_users",
        "CAST(CASE WHEN n * sxx - sx * sx > 0 THEN"
        " ((n * sxy - sx * sy) * 1000000) DIV (n * sxx - sx * sx)"
        " ELSE 0 END AS BIGINT) AS theta_e6",
        "CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS vy",
        "CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS cv",
        "CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS vx",
    ).selectExpr(
        "n_users",
        "theta_e6",
        "CAST(CASE WHEN vy > 0 THEN"
        " (vy * 1000000000000 - (vy * 1000000000000"
        "   - 2 * theta_e6 * cv * 1000000 + theta_e6 * theta_e6 * vx))"
        " DIV (vy * 1000000) ELSE 0 END AS BIGINT) AS reduction_e6",
        "CAST(CASE WHEN vx > 0 AND vy > 0 THEN"
        " floor(CAST(cv AS DOUBLE) * CAST(cv AS DOUBLE)"
        " / (CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)) * 1000000.0)"
        " ELSE 0 END AS BIGINT) AS corr2_e6",
    )


_REL_CUPED_SQL = """
WITH ev AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
  FROM events
), bounds AS (
  SELECT CAST((min(day) + max(day)) // 2 AS BIGINT) AS cut FROM ev
), u AS (
  SELECT user_id,
         CAST(sum(CASE WHEN day < (SELECT cut FROM bounds)
                       THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN day >= (SELECT cut FROM bounds)
                        AND is_purchase = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM ev GROUP BY 1
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM u
), th AS (
  SELECT n,
         CAST(CASE WHEN n * sxx - sx * sx > 0 THEN
           ((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx)
           ELSE 0 END AS BIGINT) AS theta_e6,
         CAST(n AS HUGEINT) * syy - sy * sy AS vy,
         CAST(n AS HUGEINT) * sxy - sx * sy AS cv,
         CAST(n AS HUGEINT) * sxx - sx * sx AS vx
  FROM m
)
SELECT CAST(n AS BIGINT) AS n_users, theta_e6,
       CAST(CASE WHEN vy > 0 THEN
         (vy * 1000000000000 - (vy * 1000000000000
           - 2 * theta_e6 * cv * 1000000 + theta_e6 * theta_e6 * vx))
         // (vy * 1000000) ELSE 0 END AS BIGINT) AS reduction_e6,
       CAST(CASE WHEN vx > 0 AND vy > 0 THEN
         floor(CAST(cv AS DOUBLE) * CAST(cv AS DOUBLE)
               / (CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)) * 1000000.0)
         ELSE 0 END AS BIGINT) AS corr2_e6
FROM th
"""


# Capped-balance spec — MIRRORED in `_REL_CAPPED_BALANCE_SQL`; change
# together.  Flow sign is knuth(event_id) parity (+1 even / −1 odd —
# the rel_ab_ztest NULL-split formula), so daily nets are a small
# random walk; the cap/floor are sized so BOTH clamp branches fire on
# the synthetic log (retune with the data model).
BAL_CAP = 3


def q_rel_capped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped running balance per event type (warehouse/inventory
    semantics: receipts and issues accumulate, but stock can neither
    go negative nor exceed capacity ``BAL_CAP``) — the canonical
    NON-WINDOW-EXPRESSIBLE running statistic: because every clamp
    resets the recurrence, no prefix-sum/min/max trick rewrites it as
    a plain window (unlike cumsum or the scd2 islands), so engines
    fall back to imperative UDFs — here it is the bounded-series fold
    instead (the rel_holt_trend discipline).  Per (type, day): the
    net flow, the clamped balance, and the spill (units lost to the
    cap or unmet demand below the floor — the quantity a capacity
    planner actually reads).

    Cross-engine: net = Σ ±1 by knuth(event_id) parity (exact
    BIGINT); the fold is pure BIGINT least/greatest — Spark
    aggregate() over the array_sort'ed series ↔ DuckDB WITH
    RECURSIVE over rn; spill is SIGNED (positive = overflow,
    negative = shortage).

    Scale path: ONE corpus-scale hash agg onto (type × day); the
    fold runs over that bounded series only."""
    from rxtls_spark.functions.hashing import knuth_hash

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_timestamp(ts) DIV 86400").cast("long").alias("day"),
        F.when(knuth_hash(F.col("event_id")) % 2 == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("sgn"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.sum("sgn").cast("long").alias("net")
    )
    ser = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "net"))).alias("xs")
    )
    folded = ser.select(
        "event_type",
        F.expr(
            f"aggregate(xs,"
            " CAST(array() AS array<struct<day:bigint,net:bigint,"
            "bal:bigint,spill:bigint>>),"
            " (acc, x) -> concat(acc, array("
            " CASE WHEN size(acc) = 0 THEN named_struct("
            "  'day', x.day, 'net', x.net,"
            f" 'bal', least(greatest(x.net, CAST(0 AS BIGINT)),"
            f"  CAST({BAL_CAP} AS BIGINT)),"
            f" 'spill', x.net - least(greatest(x.net, CAST(0 AS BIGINT)),"
            f"  CAST({BAL_CAP} AS BIGINT)))"
            " ELSE named_struct("
            "  'day', x.day, 'net', x.net,"
            "  'bal', least(greatest(element_at(acc, -1).bal + x.net,"
            f"  CAST(0 AS BIGINT)), CAST({BAL_CAP} AS BIGINT)),"
            "  'spill', element_at(acc, -1).bal + x.net"
            "   - least(greatest(element_at(acc, -1).bal + x.net,"
            f"  CAST(0 AS BIGINT)), CAST({BAL_CAP} AS BIGINT)))"
            " END)))"
        ).alias("ys"),
    )
    y = folded.select("event_type", F.explode("ys").alias("y"))
    return y.select(
        "event_type",
        F.col("y.day").alias("day"),
        F.col("y.net").alias("net"),
        F.col("y.bal").alias("balance"),
        F.col("y.spill").alias("spill"),
    )


_REL_CAPPED_BALANCE_SQL = f"""
WITH RECURSIVE e AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CASE WHEN (((event_id % 1000000007) * 2654435761)
                    % 1000000007) % 2 = 0
              THEN 1 ELSE -1 END AS sgn
  FROM events
), daily AS (
  SELECT event_type, CAST(day AS BIGINT) AS day,
         CAST(sum(sgn) AS BIGINT) AS net
  FROM e GROUP BY 1, 2
), ord AS (
  SELECT event_type, day, net,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM daily
), bal AS (
  SELECT event_type, day, net, rn,
         least(greatest(net, 0), {BAL_CAP}) AS bal,
         net - least(greatest(net, 0), {BAL_CAP}) AS spill
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.event_type, o.day, o.net, o.rn,
         least(greatest(b.bal + o.net, 0), {BAL_CAP}),
         b.bal + o.net - least(greatest(b.bal + o.net, 0), {BAL_CAP})
  FROM ord o JOIN bal b
    ON o.event_type = b.event_type AND o.rn = b.rn + 1
)
SELECT event_type, day, net,
       CAST(bal AS BIGINT) AS balance,
       CAST(spill AS BIGINT) AS spill
FROM bal
"""


def q_rel_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pearson correlation of quantity vs extended price
    over lineitems — the "does price scale with volume" audit (A8's
    min/max/avg family upgraded to a second-moment statistic, and the
    relational twin of `degree_assortativity`'s correlation form).
    (This repo's datagen draws price INDEPENDENT of quantity, so r
    sits near 0 — the audit's null; real TPC-H's qty×unit-price
    structure would push it toward 1, and the test locks the null.)

    Cross-engine: inputs quantize to exact BIGINTs FIRST — qty =
    floor(x+0.5), cents = floor(p·100+0.5) (NEVER a bare
    double→BIGINT CAST: Spark ANSI truncates where DuckDB rounds);
    the five moments accumulate as DECIMAL(38,0) ↔ HUGEINT (cents²
    sums pass 2^63 at ~10^5 rows); r_e6 is an e6 floor over IEEE
    ×,−,÷,sqrt on the correctly-rounded doubles of those exact sums —
    bit-identical cross-engine.

    Scale shape: ONE broadcast join (part is a dim) → ONE bounded
    hash agg (≤ brand count keys) → pure scalar math.  No window, no
    second pass."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").alias("x"),
        F.expr(
            "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"
        ).alias("y"),
    )
    pt = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    agg = (
        li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
            F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
            F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias(
                "sxy"
            ),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias(
                "sx2"
            ),
            F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias(
                "sy2"
            ),
        )
    )
    return agg.select(
        "p_brand",
        "n_items",
        F.expr("CAST(sx AS BIGINT)").alias("sum_qty"),
        F.expr("CAST(sy AS BIGINT)").alias("sum_cents"),
        F.expr(
            "CAST(CASE WHEN (CAST(n_items AS DOUBLE) * CAST(sx2 AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0.0"
            " AND (CAST(n_items AS DOUBLE) * CAST(sy2 AS DOUBLE)"
            " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0.0 THEN"
            " floor((CAST(n_items AS DOUBLE) * CAST(sxy AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
            " / sqrt((CAST(n_items AS DOUBLE) * CAST(sx2 AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
            " * (CAST(n_items AS DOUBLE) * CAST(sy2 AS DOUBLE)"
            " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) * 1000000.0)"
            " ELSE 0 END AS BIGINT)"
        ).alias("r_e6"),
    )


_REL_PRICE_CORR_SQL = """
WITH li AS (
  SELECT l_partkey,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
  FROM lineitem
), agg AS (
  SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_items,
         sum(li.x) AS sx, sum(li.y) AS sy,
         sum(li.x * li.y) AS sxy,
         sum(li.x * li.x) AS sx2,
         sum(li.y * li.y) AS sy2
  FROM li JOIN part p ON li.l_partkey = p.p_partkey
  GROUP BY 1
)
SELECT p_brand, n_items,
       CAST(sx AS BIGINT) AS sum_qty,
       CAST(sy AS BIGINT) AS sum_cents,
       CAST(CASE WHEN (CAST(n_items AS DOUBLE) * CAST(sx2 AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0.0
                  AND (CAST(n_items AS DOUBLE) * CAST(sy2 AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0.0
            THEN floor((CAST(n_items AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / sqrt((CAST(n_items AS DOUBLE) * CAST(sx2 AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                              * (CAST(n_items AS DOUBLE) * CAST(sy2 AS DOUBLE)
                                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                       * 1000000.0)
            ELSE 0 END AS BIGINT) AS r_e6
FROM agg
"""


def q_rel_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type (Page 1954; the
    binary-segmentation first split of Scott & Knott) over the daily
    count series — where did the traffic level SHIFT?  Completes the
    time-series audit family: rel_trend_mk says IF there's a drift,
    this says WHERE the level broke; rel_hourly_anomalies flags
    single outliers, this finds sustained shifts.

    Semantics: over the day-ordered series n_1..n_D, the scaled CUSUM
    S_k = D·cum_k − k·T (= D²·(cum_k/k − T/D)·k/D, sign-identical to
    the mean-shift statistic); the changepoint is
    argmax_{1≤k<D} |S_k| with the (|S| DESC, k ASC) rule — the split
    AFTER day cp_day.  Emits segment means (e3, truncating DIV) and
    their signed delta.

    Cross-engine: everything is BIGINT (cum/argmax/means — the
    pagerank zero-float discipline); the struct-max argmax mirrors
    the oracle's row_number window; exact to ~10^14 events·days
    (D·T < 2^63).

    Scale shape: ONE corpus-scale hash agg onto (type × day); the
    cumsum window and argmax run over the bounded types·horizon
    table — metadata scale, no window over raw events."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_timestamp(ts) DIV 86400").cast("long").alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    wt = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day",
        F.row_number().over(w).cast("long").alias("k"),
        F.sum("n").over(w).cast("long").alias("cum"),
        F.sum("n").over(wt).cast("long").alias("total"),
        F.count(F.lit(1)).over(wt).cast("long").alias("n_days"),
    )
    cand = cum.where(F.col("k") < F.col("n_days")).select(
        "event_type",
        "day",
        "k",
        "cum",
        "total",
        "n_days",
        F.expr("CAST(abs(n_days * cum - k * total) AS BIGINT)").alias(
            "s_abs"
        ),
    )
    best = (
        cand.groupBy("event_type")
        .agg(
            F.max(
                F.struct(
                    F.col("s_abs").alias("s_abs"),
                    (-F.col("k")).alias("neg_k"),
                    F.col("day").alias("day"),
                    F.col("cum").alias("cum"),
                    F.col("total").alias("total"),
                    F.col("n_days").alias("n_days"),
                )
            ).alias("b")
        )
        .select(
            "event_type",
            F.col("b.n_days").alias("n_days"),
            F.col("b.total").alias("total"),
            (-F.col("b.neg_k")).cast("long").alias("cp_k"),
            F.col("b.day").alias("cp_day"),
            F.col("b.s_abs").alias("s_abs"),
            F.col("b.cum").alias("cum"),
        )
        .where(F.col("n_days") > 1)
    )
    return best.select(
        "event_type",
        "n_days",
        "total",
        "cp_k",
        "cp_day",
        "s_abs",
        F.expr("CAST((cum * 1000) DIV cp_k AS BIGINT)").alias(
            "mean_pre_e3"
        ),
        F.expr(
            "CAST(((total - cum) * 1000) DIV (n_days - cp_k) AS BIGINT)"
        ).alias("mean_post_e3"),
        F.expr(
            "CAST(((total - cum) * 1000) DIV (n_days - cp_k)"
            " - (cum * 1000) DIV cp_k AS BIGINT)"
        ).alias("delta_e3"),
    )


_REL_CUSUM_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
), daily AS (
  SELECT event_type, CAST(day AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2
), cum AS (
  SELECT event_type, day,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
              AS BIGINT) AS k,
         CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day)
              AS BIGINT) AS cum,
         CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days
  FROM daily
), cand AS (
  SELECT *, CAST(abs(n_days * cum - k * total) AS BIGINT) AS s_abs
  FROM cum WHERE k < n_days
), best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY event_type ORDER BY s_abs DESC, k) AS rn
    FROM cand)
  WHERE rn = 1 AND n_days > 1
)
SELECT event_type, n_days, total, k AS cp_k, day AS cp_day, s_abs,
       CAST((cum * 1000) // k AS BIGINT) AS mean_pre_e3,
       CAST(((total - cum) * 1000) // (n_days - k) AS BIGINT)
         AS mean_post_e3,
       CAST(((total - cum) * 1000) // (n_days - k)
            - (cum * 1000) // k AS BIGINT) AS delta_e3
FROM best
"""


def q_rel_trend_mk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test + Kendall tau per event type over the
    daily count series — the nonparametric "is traffic drifting"
    monitor that pairs with `rel_ewma_daily` (EWMA tracks the level;
    MK says whether a MONOTONE trend exists at all, robust to spikes
    because only sign(n_j − n_i) enters).  Emits per type: day count,
    S = Σ_{i<j} sign, concordant/discordant/tied pair counts, the
    tie-corrected 18·var(S), tau-a = S/n_pairs (e6), and the
    continuity-corrected z (e3).

    Cross-engine: S and every pair count are exact BIGINTs from the
    day-ordered pair join; var18 = n(n−1)(2n+5) − Σ t(t−1)(2t+5) is
    pure BIGINT; tau_e6 = (S·1e6) DIV n_pairs is the SIGNED
    truncating DIV (Spark DIV == DuckDB // toward zero — the
    zipf_alpha rule); z_e3 is an e3 floor over IEEE ÷/sqrt/× on exact
    doubles only — sqrt is correctly rounded, so the float is
    bit-identical cross-engine (the graph_modularity class, not the
    ln class).

    Scale shape: ONE corpus-scale hash agg onto (type × day) — the
    series is bounded by types·horizon, so the O(d²) pair self-join
    and the tie agg run on metadata-scale tables; no window over raw
    events, no collect."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_timestamp(ts) DIV 86400").cast("long").alias("day"),
    )
    daily = (
        ev.groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    ).groupBy(F.col("a.event_type").alias("event_type")).agg(
        F.sum(F.signum(F.col("b.n") - F.col("a.n")))
        .cast("long")
        .alias("s_stat"),
        F.sum((F.col("b.n") > F.col("a.n")).cast("long"))
        .cast("long")
        .alias("n_conc"),
        F.sum((F.col("b.n") < F.col("a.n")).cast("long"))
        .cast("long")
        .alias("n_disc"),
        F.sum((F.col("b.n") == F.col("a.n")).cast("long"))
        .cast("long")
        .alias("n_tied"),
    )
    ties = (
        daily.groupBy("event_type", "n")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_ng"),
            F.sum(F.expr("t * (t - 1) * (2 * t + 5)"))
            .cast("long")
            .alias("tie18"),
            F.sum("t").cast("long").alias("n_days"),
        )
    )
    return (
        ties.join(pairs, "event_type", "left")
        .select(
            "event_type",
            "n_days",
            F.expr("CAST(n_days * (n_days - 1) DIV 2 AS BIGINT)").alias(
                "n_pairs"
            ),
            F.expr("CAST(coalesce(s_stat, 0) AS BIGINT)").alias("s_stat"),
            F.expr("CAST(coalesce(n_conc, 0) AS BIGINT)").alias("n_conc"),
            F.expr("CAST(coalesce(n_disc, 0) AS BIGINT)").alias("n_disc"),
            F.expr("CAST(coalesce(n_tied, 0) AS BIGINT)").alias("n_tied"),
            F.expr(
                "CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie18"
                " AS BIGINT)"
            ).alias("var18"),
        )
        .select(
            "event_type",
            "n_days",
            "n_pairs",
            "s_stat",
            "n_conc",
            "n_disc",
            "n_tied",
            "var18",
            F.expr(
                "CAST(CASE WHEN n_pairs > 0"
                " THEN (s_stat * 1000000) DIV n_pairs ELSE 0 END"
                " AS BIGINT)"
            ).alias("tau_e6"),
            F.expr(
                "CAST(CASE WHEN var18 > 0 AND s_stat <> 0 THEN"
                " floor((CAST(CASE WHEN s_stat > 0 THEN s_stat - 1"
                "             ELSE s_stat + 1 END AS DOUBLE)"
                " / sqrt(CAST(var18 AS DOUBLE) / 18.0)) * 1000.0)"
                " ELSE 0 END AS BIGINT)"
            ).alias("z_e3"),
        )
    )


_REL_TREND_MK_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
), daily AS (
  SELECT event_type, CAST(day AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type,
         CAST(sum(sign(b.n - a.n)) AS BIGINT) AS s_stat,
         CAST(sum(CASE WHEN b.n > a.n THEN 1 ELSE 0 END) AS BIGINT)
           AS n_conc,
         CAST(sum(CASE WHEN b.n < a.n THEN 1 ELSE 0 END) AS BIGINT)
           AS n_disc,
         CAST(sum(CASE WHEN b.n = a.n THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tied
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
  GROUP BY 1
), ties AS (
  SELECT event_type,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18,
         CAST(sum(t) AS BIGINT) AS n_days
  FROM (
    SELECT event_type, n, CAST(count(*) AS BIGINT) AS t
    FROM daily GROUP BY 1, 2
  ) GROUP BY 1
), j AS (
  SELECT t.event_type, t.n_days,
         CAST(t.n_days * (t.n_days - 1) // 2 AS BIGINT) AS n_pairs,
         CAST(coalesce(p.s_stat, 0) AS BIGINT) AS s_stat,
         CAST(coalesce(p.n_conc, 0) AS BIGINT) AS n_conc,
         CAST(coalesce(p.n_disc, 0) AS BIGINT) AS n_disc,
         CAST(coalesce(p.n_tied, 0) AS BIGINT) AS n_tied,
         CAST(t.n_days * (t.n_days - 1) * (2 * t.n_days + 5) - t.tie18
              AS BIGINT) AS var18
  FROM ties t LEFT JOIN pairs p USING (event_type)
)
SELECT event_type, n_days, n_pairs, s_stat, n_conc, n_disc, n_tied, var18,
       CAST(CASE WHEN n_pairs > 0 THEN (s_stat * 1000000) // n_pairs
                 ELSE 0 END AS BIGINT) AS tau_e6,
       CAST(CASE WHEN var18 > 0 AND s_stat <> 0 THEN
              floor((CAST(CASE WHEN s_stat > 0 THEN s_stat - 1
                          ELSE s_stat + 1 END AS DOUBLE)
                     / sqrt(CAST(var18 AS DOUBLE) / 18.0)) * 1000.0)
            ELSE 0 END AS BIGINT) AS z_e3
FROM j
"""


QUERIES_REL: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "rel_trend_mk": q_rel_trend_mk,
    "rel_benford_audit": q_rel_benford_audit,
    "rel_cusum_changepoint": q_rel_cusum_changepoint,
    "rel_price_corr": q_rel_price_corr,
    "rel_holt_trend": q_rel_holt_trend,
    "rel_capped_balance": q_rel_capped_balance,
    "rel_cuped": q_rel_cuped,
    "rel_pvm": q_rel_pvm,
    "rel_path_trigrams": q_rel_path_trigrams,
    "rel_peak_concurrency": q_rel_peak_concurrency,
    "rel_log_compaction": q_log_compaction,
    "rel_retention_cohorts": q_retention_cohorts,
    "rel_local_supplier_volume": q_local_supplier_volume,
    "rel_event_funnel": q_event_funnel,
    "rel_hourly_anomalies": q_hourly_anomalies,
    "rel_pricing_summary": q_pricing_summary,
    "rel_revenue_topk": q_revenue_topk,
    "rel_supplier_by_region": q_supplier_by_region,
    "rel_customers_with_orders": q_customers_with_orders,
    "rel_customers_without_orders": q_customers_without_orders,
    "rel_top_orders_per_customer": q_top_orders_per_customer,
    "rel_order_price_lag": q_order_price_lag,
    "rel_events_hourly": q_events_hourly,
    "rel_events_user_stats": q_events_user_stats,
    "rel_set_ops": q_set_ops,
    "rel_priority_tokens": q_orders_per_priority_bucket,
    "rel_event_sessions": q_event_sessions,
    "rel_rollup_pricing": q_rollup_pricing,
    "rel_exact_median": q_exact_median,
    "rel_events_pivot": q_events_pivot,
    "rel_asof_join": q_asof_join,
    "rel_attribution": q_rel_attribution,
    "rel_integrity_audit": q_rel_integrity_audit,
    "rel_scd2_intervals": q_rel_scd2_intervals,
    "rel_burstiness": q_rel_burstiness,
    "rel_markov_transitions": q_rel_markov_transitions,
    "rel_ab_ztest": q_rel_ab_ztest,
    "rel_basket_lift": q_rel_basket_lift,
    "rel_seasonality": q_rel_seasonality,
    "rel_ewma_daily": q_rel_ewma_daily,
    "rel_rolling_actives": q_rel_rolling_actives,
    "rel_rfm_segments": q_rel_rfm_segments,
    "rel_survival_table": q_rel_survival_table,
    "rel_range_join": q_range_join,
    "rel_skew_salted_join": q_skew_salted_join,
    "rel_events_sliding": q_events_sliding,
    "sink_compaction": q_sink_compaction,
}

ORACLES_REL: dict[str, str] = {
    "rel_trend_mk": _REL_TREND_MK_SQL,
    "rel_benford_audit": _rel_benford_sql(),
    "rel_cusum_changepoint": _REL_CUSUM_SQL,
    "rel_price_corr": _REL_PRICE_CORR_SQL,
    "rel_holt_trend": _REL_HOLT_SQL,
    "rel_capped_balance": _REL_CAPPED_BALANCE_SQL,
    "rel_cuped": _REL_CUPED_SQL,
    "rel_pvm": _REL_PVM_SQL,
    "rel_path_trigrams": _REL_PATH_TRIGRAMS_SQL,
    "rel_peak_concurrency": _REL_PEAK_CONCURRENCY_SQL,
    "rel_local_supplier_volume": """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY 1
""",
    "rel_log_compaction": """
WITH ranked AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         event_id, event_type, value,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY CAST(floor(epoch(ts)) AS BIGINT) DESC, event_id DESC
         ) AS rn,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
  FROM events
)
SELECT user_id, es AS last_es, CAST(event_id AS BIGINT) AS last_event_id,
       event_type AS last_event_type,
       value AS last_value, n_events
FROM ranked WHERE rn = 1
""",
    "rel_retention_cohorts": """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
), coh AS (
  SELECT user_id, day,
         min(day) OVER (PARTITION BY user_id) AS cohort_day
  FROM days
), agg AS (
  SELECT cohort_day, day - cohort_day AS offset_d,
         CAST(count(*) AS BIGINT) AS n_active
  FROM coh GROUP BY 1, 2
), sized AS (
  SELECT cohort_day, offset_d, n_active,
         CAST(max(CASE WHEN offset_d = 0 THEN n_active END)
              OVER (PARTITION BY cohort_day) AS BIGINT) AS n_cohort
  FROM agg
)
SELECT cohort_day, offset_d, n_active, n_cohort,
       CAST((n_active * 1000) // n_cohort AS BIGINT) AS ret_permille
FROM sized
""",
    "rel_event_funnel": """
-- floor(epoch) everywhere: Spark's unix_timestamp truncates to whole
-- seconds, DuckDB's epoch keeps microseconds
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
    CAST(floor(epoch(ts)) AS BIGINT) AS es,
    CASE WHEN lag(ts) OVER w IS NULL
           OR CAST(floor(epoch(ts)) AS BIGINT)
              - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_type, es, sum(new_session) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
), s1 AS (
  SELECT user_id, session_id,
         min(CASE WHEN event_type = 'signup' THEN es END) AS t1
  FROM sess GROUP BY 1, 2
), s2 AS (
  SELECT s.user_id, s.session_id, min(s.es) AS t2
  FROM sess s JOIN s1 ON s.user_id = s1.user_id AND s.session_id = s1.session_id
  WHERE s1.t1 IS NOT NULL AND s.event_type = 'click' AND s.es >= s1.t1
  GROUP BY 1, 2
), s3 AS (
  SELECT s.user_id, s.session_id, min(s.es) AS t3
  FROM sess s JOIN s2 ON s.user_id = s2.user_id AND s.session_id = s2.session_id
  WHERE s.event_type = 'purchase' AND s.es >= s2.t2
  GROUP BY 1, 2
), stages AS (
  SELECT user_id, '1_signup' AS stage FROM s1 WHERE t1 IS NOT NULL
  UNION ALL SELECT user_id, '2_click' FROM s2
  UNION ALL SELECT user_id, '3_purchase' FROM s3
)
SELECT stage, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM stages GROUP BY 1
""",
    "rel_hourly_anomalies": """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), r AS (
  SELECT *, CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         CAST(row_number() OVER (
           PARTITION BY event_type ORDER BY c, hr) AS BIGINT) AS rn
  FROM h
), m AS (
  SELECT *, CAST(sum(c * (CAST(rn = (n + 1) // 2 AS BIGINT)
                          + CAST(rn = (n + 2) // 2 AS BIGINT)))
    OVER (PARTITION BY event_type) AS BIGINT) AS med2
  FROM r
), d AS (
  SELECT *, abs(2 * c - med2) AS dev2 FROM m
), r2 AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY event_type ORDER BY dev2, hr) AS BIGINT) AS rn2
  FROM d
), m2 AS (
  SELECT *, CAST(sum(dev2 * (CAST(rn2 = (n + 1) // 2 AS BIGINT)
                             + CAST(rn2 = (n + 2) // 2 AS BIGINT)))
    OVER (PARTITION BY event_type) AS BIGINT) AS mad4
  FROM r2
)
SELECT event_type, CAST(epoch(hr) AS BIGINT) AS hour_start, c, med2, mad4,
  CAST(((2 * c - med2) * 2000) // greatest(mad4, 1) AS BIGINT) AS z_e3
FROM m2
""",
    "sink_compaction": """
WITH inv AS (
  SELECT event_type AS sink_key,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(strlen(props) + 32) AS BIGINT) AS bytes
  FROM events GROUP BY 1, 2
), planned AS (
  SELECT *,
    CAST((sum(bytes) OVER (PARTITION BY sink_key ORDER BY hour_epoch
                           ROWS UNBOUNDED PRECEDING) - bytes) // 4096
         AS BIGINT) AS grp
  FROM inv
)
SELECT sink_key, hour_epoch, n_rows, bytes, grp,
  CAST(count(*) OVER (PARTITION BY sink_key, grp) AS BIGINT) AS grp_files,
  CAST(sum(bytes) OVER (PARTITION BY sink_key, grp) AS BIGINT) AS grp_bytes
FROM planned
""",
    "rel_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
""",
    "rel_revenue_topk": """
SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderstatus <> 'F'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey LIMIT 10
""",
    "rel_supplier_by_region": """
SELECT r_name AS region, CAST(count(*) AS BIGINT) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
""",
    "rel_customers_with_orders": """
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers
FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
""",
    "rel_customers_without_orders": """
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers
FROM customer c WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
GROUP BY 1
""",
    "rel_event_sessions": """
-- floor(epoch) everywhere: Spark's unix_timestamp truncates to whole
-- seconds, DuckDB's epoch keeps microseconds
WITH marked AS (
  SELECT user_id, ts, event_id,
    CAST(floor(epoch(ts)) AS BIGINT) AS es,
    CASE WHEN lag(ts) OVER w IS NULL
           OR CAST(floor(epoch(ts)) AS BIGINT)
              - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, sum(new_session) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
), per_session AS (
  SELECT user_id, session_id, count(*) AS n_events,
         max(es) - min(es) AS duration_s
  FROM sess GROUP BY 1, 2
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(max(duration_s) AS BIGINT) AS max_duration_s
FROM per_session GROUP BY 1
""",
    "rel_top_orders_per_customer": """
SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn, round(o_totalprice, 2) AS price
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders)
WHERE rn <= 3
""",
    "rel_order_price_lag": """
SELECT o_custkey, o_orderkey,
       round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
       CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS order_seq
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    "rel_events_hourly": """
SELECT event_type,
       CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 3) AS sum_value
FROM events GROUP BY 1, 2
""",
    "rel_events_user_stats": """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       round(avg(value), 5) AS avg_value
FROM events GROUP BY 1
""",
    "rel_set_ops": """
SELECT CAST((SELECT count(DISTINCT o_custkey) FROM orders
             WHERE o_orderstatus IN ('O','F')) AS BIGINT) AS n_union,
       CAST((SELECT count(*) FROM
              (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus='O'
               INTERSECT
               SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus='F')) AS BIGINT)
         AS n_intersect,
       CAST((SELECT count(*) FROM
              (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus='O'
               EXCEPT
               SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus='F')) AS BIGINT)
         AS n_except
""",
    "rel_rollup_pricing": """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    "rel_events_pivot": """
SELECT user_id,
       round(sum(value) FILTER (event_type = 'click'), 4) AS sum_click,
       round(sum(value) FILTER (event_type = 'view'), 4) AS sum_view,
       round(sum(value) FILTER (event_type = 'purchase'), 4) AS sum_purchase,
       CAST(count(value) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(value) FILTER (event_type = 'view') AS BIGINT) AS n_view,
       CAST(count(value) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase
FROM events GROUP BY 1
""",
    "rel_exact_median": """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
FROM lineitem GROUP BY 1
""",
    "rel_priority_tokens": """
SELECT tok, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(o_orderpriority, '-')) AS tok FROM orders)
GROUP BY 1
""",
    # Native DuckDB ASOF join over the identical deduped build side;
    # ASOF picks the greatest v.ts <= c.ts, exactly what the Spark
    # merge (ordered last-ignorenulls) computes.
    "rel_survival_table": f"""
WITH ev AS (
  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS t_us
  FROM events
), pu AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN t_us END) AS signup_us
  FROM ev GROUP BY 1
  HAVING min(CASE WHEN event_type = 'signup' THEN t_us END) IS NOT NULL
), fp AS (
  SELECT e.user_id, min(e.t_us) AS purchase_us
  FROM ev e JOIN pu USING (user_id)
  WHERE e.event_type = 'purchase' AND e.t_us >= pu.signup_us
  GROUP BY 1
), oe AS (
  SELECT max(t_us) AS end_us FROM ev
), timed0 AS (
  SELECT (fp.purchase_us - pu.signup_us) // 86400000000 AS delay,
         least((oe.end_us - pu.signup_us) // 86400000000,
               CAST({SURV_CAP_DAYS} AS BIGINT)) AS cens
  FROM pu LEFT JOIN fp USING (user_id) CROSS JOIN oe
), timed AS (
  SELECT CASE WHEN delay IS NOT NULL AND delay <= cens
              THEN delay ELSE cens END AS t,
         CASE WHEN delay IS NOT NULL AND delay <= cens
              THEN 1 ELSE 0 END AS is_event
  FROM timed0
), tbl AS (
  SELECT t, CAST(sum(is_event) AS BIGINT) AS d,
         CAST(sum(1 - is_event) AS BIGINT) AS c
  FROM timed GROUP BY 1
)
SELECT t, d, c,
       CAST(sum(d + c) OVER (ORDER BY t DESC
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_risk
FROM tbl
""",
    "rel_ab_ztest": """
WITH arms AS (
  SELECT (((event_id % 1000000007) * 2654435761) % 1000000007) % 2 AS arm,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
  FROM events
), agg AS (
  SELECT
    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS ca,
    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS cb
  FROM arms
)
SELECT na, ca, nb, cb,
  CAST((ca * 1000) // na AS BIGINT) AS pa_permille,
  CAST((cb * 1000) // nb AS BIGINT) AS pb_permille,
  CAST(floor(((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) /
    sqrt((CAST(ca + cb AS DOUBLE) / (na + nb)) *
    (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb)) *
    (1.0 / na + 1.0 / nb))) * 1000) AS BIGINT) AS z_e3
FROM agg
""",
    "rel_basket_lift": """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), nu AS (
  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM ut
), singles AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_t FROM ut GROUP BY 1
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_ab,
  sa.n_t AS n_a, sb.n_t AS n_b,
  CAST((n_ab * 1000) // sa.n_t AS BIGINT) AS conf_a_permille,
  CAST((n_ab * 1000) // sb.n_t AS BIGINT) AS conf_b_permille,
  CAST(floor(ln((CAST(n_ab AS DOUBLE) * CAST(nu.n AS DOUBLE)) /
       (CAST(sa.n_t AS DOUBLE) * CAST(sb.n_t AS DOUBLE))) * 1000)
       AS BIGINT) AS lift_e3
FROM pairs
JOIN singles sa ON sa.event_type = pairs.type_a
JOIN singles sb ON sb.event_type = pairs.type_b, nu
""",
    "rel_seasonality": """
WITH e AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
), b AS (
  SELECT (es // 86400 + 4) % 7 AS dow,
         (es % 86400) // 3600 AS hour,
         CAST(count(*) AS BIGINT) AS n_events
  FROM e GROUP BY 1, 2
)
SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour, n_events,
       CAST((n_events * 1000000) // sum(n_events) OVER () AS BIGINT)
         AS share_e6,
       CAST(CASE WHEN n_events = max(n_events) OVER () THEN 1 ELSE 0 END
            AS BIGINT) AS is_peak
FROM b
""",
    # rel_ewma_daily: recurrence mirrored via WITH RECURSIVE over rn —
    # (3·s + 1000·n) // 4 truncates identically to Spark DIV on the
    # positive operands; spike CASE order/form mirrored.
    "rel_ewma_daily": """
WITH RECURSIVE e AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
), daily AS (
  SELECT event_type, CAST(day AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2
), ord AS (
  SELECT event_type, day, n,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM daily
), ew AS (
  SELECT event_type, day, n, rn, n * 1000 AS s_e3
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.event_type, o.day, o.n, o.rn,
         (3 * ew.s_e3 + 1000 * o.n) // 4
  FROM ord o JOIN ew
    ON o.event_type = ew.event_type AND o.rn = ew.rn + 1
)
SELECT event_type, day, n AS n_events, CAST(s_e3 AS BIGINT) AS ewma_e3,
       CAST(n * 1000 - s_e3 AS BIGINT) AS err_e3,
       CAST(CASE WHEN n * 2000 > 3 * s_e3 THEN 1 ELSE 0 END AS BIGINT)
         AS is_spike
FROM ew
""",
    "rel_markov_transitions": """
WITH pairs AS (
  SELECT coalesce(lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id),
                  '^') AS prev_type,
         event_type AS next_type
  FROM events
), cnt AS (
  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n_trans
  FROM pairs GROUP BY 1, 2
)
SELECT prev_type, next_type, n_trans,
       CAST(sum(n_trans) OVER (PARTITION BY prev_type) AS BIGINT) AS n_prev,
       CAST((n_trans * 1000)
            // sum(n_trans) OVER (PARTITION BY prev_type) AS BIGINT)
         AS p_permille
FROM cnt
""",
    "rel_burstiness": f"""
WITH ev AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t_us, event_id
  FROM events
), gaps AS (
  SELECT user_id,
         t_us - lag(t_us) OVER (PARTITION BY user_id
                                ORDER BY t_us, event_id) AS gap_us
  FROM ev
)
SELECT user_id,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(gap_us) AS BIGINT) AS n_gaps,
  CAST(sum(gap_us // 1000000) AS BIGINT) AS sum_gap_s,
  CAST(sum((gap_us // 1000000) * (gap_us // 1000000)) AS BIGINT)
    AS sum_gap2_s,
  CAST(max(gap_us // 1000000) AS BIGINT) AS max_gap_s,
  CAST(sum(CASE WHEN gap_us < {BURST_GAP_US} THEN 1 ELSE 0 END)
       AS BIGINT) AS n_bursts
FROM gaps GROUP BY 1
""",
    "rel_scd2_intervals": """
WITH ev AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t_us,
         event_id, event_type
  FROM events
), marked AS (
  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
                   OR lag(event_type) OVER w <> event_type
            THEN 1 ELSE 0 END AS chg
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
), islands AS (
  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
                                ORDER BY t_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS island
  FROM marked
), runs AS (
  SELECT user_id, island,
         min(event_type) AS event_type,
         CAST(min(t_us) AS BIGINT) AS valid_from_us,
         CAST(count(*) AS BIGINT) AS n_events
  FROM islands GROUP BY 1, 2
)
SELECT user_id, island AS seq, event_type, valid_from_us,
       CAST(lead(valid_from_us) OVER (PARTITION BY user_id
                                      ORDER BY island) AS BIGINT)
         AS valid_to_us,
       n_events
FROM runs
""",
    "rel_integrity_audit": """
SELECT 'orphan_orders' AS check,
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
            AS BIGINT) AS n_bad,
       CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_total
UNION ALL
SELECT 'orphan_lineitems',
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
            AS BIGINT),
       CAST((SELECT count(*) FROM lineitem) AS BIGINT)
UNION ALL
SELECT 'orphan_customers',
       CAST((SELECT count(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM nation n
                               WHERE n.n_nationkey = c.c_nationkey))
            AS BIGINT),
       CAST((SELECT count(*) FROM customer) AS BIGINT)
UNION ALL
SELECT 'dup_orderkeys',
       CAST((SELECT count(*) FROM (
               SELECT o_orderkey FROM orders
               GROUP BY 1 HAVING count(*) > 1)) AS BIGINT),
       CAST((SELECT count(DISTINCT o_orderkey) FROM orders) AS BIGINT)
UNION ALL
SELECT 'nonpositive_price',
       CAST((SELECT count(*) FROM orders WHERE o_totalprice <= 0)
            AS BIGINT),
       CAST((SELECT count(*) FROM orders) AS BIGINT)
UNION ALL
SELECT 'negative_acctbal',
       CAST((SELECT count(*) FROM customer WHERE c_acctbal < 0)
            AS BIGINT),
       CAST((SELECT count(*) FROM customer) AS BIGINT)
""",
    "rel_attribution": """
WITH t AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE event_type <> 'purchase'
), c AS (
  SELECT user_id, ts, event_id, value FROM events
  WHERE event_type = 'purchase'
), pick AS (
  SELECT c.event_id AS conv_id, c.value, t.event_type,
         row_number() OVER (PARTITION BY c.event_id
                            ORDER BY t.ts DESC, t.event_id DESC) AS rl,
         row_number() OVER (PARTITION BY c.event_id
                            ORDER BY t.ts ASC, t.event_id ASC) AS rf
  FROM c JOIN t ON t.user_id = c.user_id AND t.ts <= c.ts
), credit AS (
  SELECT 'last' AS kind, coalesce(p.event_type, 'none') AS touch_type,
         c.value
  FROM c LEFT JOIN pick p ON p.conv_id = c.event_id AND p.rl = 1
  UNION ALL
  SELECT 'first' AS kind, coalesce(p.event_type, 'none') AS touch_type,
         c.value
  FROM c LEFT JOIN pick p ON p.conv_id = c.event_id AND p.rf = 1
)
SELECT kind, touch_type, CAST(count(*) AS BIGINT) AS n_conv,
       round(sum(value), 2) AS sum_value
FROM credit GROUP BY 1, 2
""",
    "rel_asof_join": """
WITH v AS (
  SELECT user_id, ts, CAST(max(event_id) AS BIGINT) AS view_event_id
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
), c AS (
  SELECT CAST(event_id AS BIGINT) AS event_id, user_id, ts
  FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id,
       CAST(epoch_us(c.ts) AS BIGINT) AS ts_us,
       v.view_event_id,
       CAST(epoch_us(c.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
FROM c ASOF LEFT JOIN v
  ON c.user_id = v.user_id AND c.ts >= v.ts
""",
    # Interval bands interpolated from RANGE_BANDS — the Python list
    # and this VALUES clause are the same object at import time, so
    # they cannot drift.
    "rel_range_join": """
WITH bands(band, lo, hi) AS (VALUES {bands})
SELECT band, CAST(count(*) AS BIGINT) AS n_parts,
       round(sum(p_retailprice), 2) AS sum_retail
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY 1
""".format(
        bands=", ".join(
            f"('{b}', {lo!r}, {hi!r})" for b, lo, hi in RANGE_BANDS
        )
    ),
    # The PLAIN join — salting must be invisible in the result.
    "rel_skew_salted_join": """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
""",
    # Every event belongs to the two epoch-aligned 2h/1h-slide windows
    # starting at floor(t/3600)*3600 and that minus 3600.
    "rel_events_sliding": """
WITH offs(off) AS (VALUES (0), (3600)),
e AS (SELECT event_type, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events)
SELECT CAST((es // 3600) * 3600 - off AS BIGINT) AS win_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value
FROM e CROSS JOIN offs
GROUP BY 1, 2
""",
    # Exact rolling distinct via the bounded-day range join — mirrors
    # q_rel_rolling_actives (day = es DIV 86400, the seasonality rule).
    "rel_rolling_actives": """
WITH e AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day, user_id
  FROM events
), ud AS (
  SELECT DISTINCT day, user_id FROM e
), days AS (
  SELECT DISTINCT day FROM ud
), dau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1
), wau AS (
  SELECT d.day AS day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
  FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
  GROUP BY 1
)
SELECT CAST(dau.day AS BIGINT) AS day, dau.dau, wau.wau,
       CAST((dau.dau * 1000) // wau.wau AS BIGINT) AS stickiness_permille
FROM dau JOIN wau ON dau.day = wau.day
""",
    # Mirrors q_rel_rfm_segments: cents = floor(value*100 + 0.5) per
    # row, min-rank quintiles from bounded metric histograms (rank =
    # 1 + strictly-better count, score = 5 - (5*(rank-1)) // n), whole-
    # dollar monetary buckets, verdict CASE order IS the semantics.
    "rel_rfm_segments": """
WITH p AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), u AS (
  SELECT user_id,
         max(es) // 86400 AS last_day,
         CAST(count(*) AS BIGINT) AS f,
         CAST(sum(cents) AS BIGINT) AS m_cents
  FROM p GROUP BY 1
), anc AS (
  SELECT max(last_day) AS anchor_day FROM u
), m AS (
  SELECT user_id, anchor_day - last_day AS r_days, f, m_cents,
         m_cents // 100 AS m_b
  FROM u, anc
), hr AS (
  SELECT b, coalesce(sum(c) OVER (ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS better
  FROM (SELECT r_days AS b, CAST(count(*) AS BIGINT) AS c
        FROM m GROUP BY 1)
), hf AS (
  SELECT b, coalesce(sum(c) OVER (ORDER BY b DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS better
  FROM (SELECT f AS b, CAST(count(*) AS BIGINT) AS c FROM m GROUP BY 1)
), hm AS (
  SELECT b, coalesce(sum(c) OVER (ORDER BY b DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS better
  FROM (SELECT m_b AS b, CAST(count(*) AS BIGINT) AS c FROM m GROUP BY 1)
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM m
), scored AS (
  SELECT m.user_id, m.r_days, m.f, m.m_cents,
         CAST(5 - (5 * hr.better) // nn.n AS BIGINT) AS r_score,
         CAST(5 - (5 * hf.better) // nn.n AS BIGINT) AS f_score,
         CAST(5 - (5 * hm.better) // nn.n AS BIGINT) AS m_score
  FROM m
  JOIN hr ON m.r_days = hr.b
  JOIN hf ON m.f = hf.b
  JOIN hm ON m.m_b = hm.b, nn
)
SELECT user_id, CAST(r_days AS BIGINT) AS r_days, f, m_cents,
       r_score, f_score, m_score,
       CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
            WHEN f_score >= 4 THEN 'loyal'
            WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
            WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
            WHEN r_score <= 2 THEN 'hibernating'
            ELSE 'regular' END AS segment
FROM scored
""",
}
