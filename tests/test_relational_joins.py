"""As-of / range / skew-salted join and sliding-window coverage
(SURVEY §2.3's "provided by Spark built-ins" row, made real).

Semantics locks:
- rel_asof_join == brute-force per-click argmax over prior views
  (the merge pattern must equal the O(n^2) definition).
- rel_skew_salted_join == the plain unsalted join bit-for-bit
  (salting must be invisible in the result).
- rel_events_sliding: every event appears in exactly 2 windows.

Plan locks:
- as-of join: NO join node at all (merge = union + one window pass).
- range join: BroadcastNestedLoopJoin (dim is broadcast), never a
  CartesianProduct or shuffled join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rxtls_spark.plans.checks import plan_string
from rxtls_spark.queries_relational import (
    SKEW_NSALT,
    q_asof_join,
    q_events_sliding,
    q_range_join,
    q_skew_salted_join,
)
from tests.conftest import SF_SMOKE


def test_asof_join_matches_bruteforce(spark):
    out = {r["event_id"]: r for r in q_asof_join(spark, SF_SMOKE).collect()}
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    rows = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    ).collect()
    views: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        if r["event_type"] == "view":
            views.setdefault(r["user_id"], []).append((r["t"], r["event_id"]))
    n_clicks = 0
    for r in rows:
        if r["event_type"] != "click":
            continue
        n_clicks += 1
        got = out[r["event_id"]]
        assert got["user_id"] == r["user_id"]
        assert got["ts_us"] == r["t"]
        # brute-force as-of: latest view at-or-before the click;
        # ties on ts break to max event_id (the deduped build side).
        cand = [(t, e) for (t, e) in views.get(r["user_id"], []) if t <= r["t"]]
        if not cand:
            assert got["view_event_id"] is None and got["gap_us"] is None
        else:
            best_t = max(t for t, _ in cand)
            best_e = max(e for t, e in cand if t == best_t)
            assert got["view_event_id"] == best_e, (r["event_id"], got)
            assert got["gap_us"] == r["t"] - best_t
    assert len(out) == n_clicks and n_clicks > 0


def test_asof_join_plan_has_no_join_node(spark):
    df = q_asof_join(spark, SF_SMOKE)
    p = plan_string(df, "simple")
    assert "Join" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p
    # one shuffle for the build-side dedup agg, one for the merge window
    assert p.count("Exchange") <= 3, p


def test_range_join_is_broadcast_nested_loop(spark):
    df = q_range_join(spark, SF_SMOKE)
    p = plan_string(df, "simple")
    assert "BroadcastNestedLoopJoin" in p, p
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p, p
    rows = {r["band"]: r for r in df.collect()}
    n_parts = spark.read.parquet(f"{SF_SMOKE}/part.parquet").count()
    # bands are exhaustive half-open intervals: every part lands once
    assert sum(r["n_parts"] for r in rows.values()) == n_parts


def test_skew_salted_join_equals_plain_join(spark):
    salted = {
        r["c_mktsegment"]: (r["n_orders"], r["sum_price"])
        for r in q_skew_salted_join(spark, SF_SMOKE).collect()
    }
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    plain = {
        r["c_mktsegment"]: (r["n_orders"], r["sum_price"])
        for r in (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            )
            .collect()
        )
    }
    assert salted == plain and len(salted) > 0
    assert SKEW_NSALT >= 2  # salting actually spreads


def test_events_sliding_every_event_in_two_windows(spark):
    df = q_events_sliding(spark, SF_SMOKE)
    rows = df.collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_events = ev.count()
    assert sum(r["n"] for r in rows) == 2 * n_events
    # window starts are hour-aligned and every window length is 2h by
    # construction; spot-check one event's two windows exist
    one = ev.select(F.unix_timestamp("ts").alias("es")).first()["es"]
    base = (one // 3600) * 3600
    starts = {r["win_start"] for r in rows}
    assert base in starts and base - 3600 in starts


def test_event_funnel_matches_sequential_replica(spark):
    """Python replica of sessionize → staged conditional mins, plus the
    funnel monotonicity law (sessions can only drop out stage to
    stage, never appear)."""
    from collections import defaultdict

    from rxtls_spark.queries_relational import q_event_funnel

    events = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_timestamp("ts").alias("es"),
            "ts",
        )
        .collect()
    )
    by_user = defaultdict(list)
    for r in events:
        by_user[r["user_id"]].append(r)
    n1 = n2 = n3 = 0
    u1, u2, u3 = set(), set(), set()
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        sessions = []
        prev = None
        for r in rows:
            if prev is None or r["es"] - prev > 1800:
                sessions.append([])
            sessions[-1].append(r)
            prev = r["es"]
        for sess in sessions:
            t1 = min(
                (r["es"] for r in sess if r["event_type"] == "signup"),
                default=None,
            )
            if t1 is None:
                continue
            n1 += 1
            u1.add(uid)
            t2 = min(
                (
                    r["es"]
                    for r in sess
                    if r["event_type"] == "click" and r["es"] >= t1
                ),
                default=None,
            )
            if t2 is None:
                continue
            n2 += 1
            u2.add(uid)
            t3 = min(
                (
                    r["es"]
                    for r in sess
                    if r["event_type"] == "purchase" and r["es"] >= t2
                ),
                default=None,
            )
            if t3 is None:
                continue
            n3 += 1
            u3.add(uid)

    got = {r["stage"]: r for r in q_event_funnel(spark, SF_SMOKE).collect()}
    want = {
        "1_signup": (n1, len(u1)),
        "2_click": (n2, len(u2)),
        "3_purchase": (n3, len(u3)),
    }
    want = {k: v for k, v in want.items() if v[0] > 0}
    assert {k: (r["n_sessions"], r["n_users"]) for k, r in got.items()} == want
    assert n1 >= n2 >= n3
    assert n1 > 0, "smoke data must produce at least one signup session"


def test_hourly_anomalies_median_mad_replica(spark):
    """med2/mad4 must equal 2*median and 4*MAD computed by sorting in
    Python, and z_e3 the truncating-division formula — per event type."""
    from collections import defaultdict

    from rxtls_spark.queries_relational import q_hourly_anomalies

    def trunc_div(num: int, den: int) -> int:
        q = abs(num) // abs(den)
        return q if (num >= 0) == (den > 0) else -q

    def med2_of(vals):
        s = sorted(vals)
        n = len(s)
        return s[(n - 1) // 2] + s[n // 2]  # 2*median, exact ints

    events = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .collect()
    )
    counts = defaultdict(lambda: defaultdict(int))
    for r in events:
        counts[r["event_type"]][r["hr"]] += 1

    got = defaultdict(dict)
    for r in q_hourly_anomalies(spark, SF_SMOKE).collect():
        got[r["event_type"]][r["hour_start"]] = r
    assert set(got) == set(counts)
    for et, hours in counts.items():
        med2 = med2_of(hours.values())
        dev2 = {h: abs(2 * c - med2) for h, c in hours.items()}
        mad4 = med2_of(dev2.values())
        assert len(got[et]) == len(hours)
        for h, c in hours.items():
            import calendar

            hs = calendar.timegm(h.timetuple())
            r = got[et][hs]
            z = trunc_div((2 * c - med2) * 2000, max(mad4, 1))
            assert (r["c"], r["med2"], r["mad4"], r["z_e3"]) == (
                c, med2, mad4, z,
            ), (et, h)


def test_retention_cohorts_matches_python_replica(spark):
    """Cohort-matrix replica from raw (user, epoch-second) pairs plus
    the structural invariants: offset-0 rows carry the full cohort
    (n_active == n_cohort, ret_permille == 1000), retention never
    exceeds the cohort size, and offsets are non-negative."""
    from collections import defaultdict

    from rxtls_spark.queries_relational import q_retention_cohorts

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "user_id", F.unix_timestamp("ts").alias("es")
    )
    days = defaultdict(set)
    for r in ev.collect():
        days[r["user_id"]].add(r["es"] // 86400)
    agg = defaultdict(int)
    for _, ds in days.items():
        first = min(ds)
        for d in ds:
            agg[(first, d - first)] += 1

    rows = q_retention_cohorts(spark, SF_SMOKE).collect()
    got = {(r["cohort_day"], r["offset_d"]): r for r in rows}
    assert {(c, o): r["n_active"] for (c, o), r in got.items()} == dict(agg)
    for (c, o), r in got.items():
        assert r["n_cohort"] == agg[(c, 0)]
        assert 0 <= r["n_active"] <= r["n_cohort"]
        assert r["ret_permille"] == r["n_active"] * 1000 // r["n_cohort"]
        assert o >= 0
        if o == 0:
            assert r["ret_permille"] == 1000


def test_log_compaction_matches_python_replica(spark):
    """Latest-record-per-key replica: per user the (es, event_id)-max
    event's attributes and the exact history depth; the struct-max agg
    must equal the window-rank definition."""
    from rxtls_spark.queries_relational import q_log_compaction

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "user_id",
        F.unix_timestamp("ts").alias("es"),
        "event_id",
        "event_type",
        "value",
    )
    best, depth = {}, {}
    for r in ev.collect():
        k = r["user_id"]
        depth[k] = depth.get(k, 0) + 1
        key = (r["es"], r["event_id"])
        if k not in best or key > best[k][0]:
            best[k] = (key, r["event_type"], r["value"])

    got = {r["user_id"]: r for r in q_log_compaction(spark, SF_SMOKE).collect()}
    assert set(got) == set(best)
    for k, ((es, eid), etype, val) in best.items():
        r = got[k]
        assert (
            r["last_es"], r["last_event_id"], r["last_event_type"],
            r["last_value"], r["n_events"],
        ) == (es, eid, etype, val, depth[k]), k


def test_local_supplier_volume_replica_and_plan(spark):
    """Q5-shape replica in Python (same-nation customer/supplier rule)
    plus the plan locks: nation/region ride broadcasts, no cartesian
    product, no sort-merge join at this scale."""
    from collections import defaultdict

    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.queries_relational import q_local_supplier_volume

    def rows(t):
        return spark.read.parquet(f"{SF_SMOKE}/{t}.parquet").collect()

    nat = {r["n_nationkey"]: r for r in rows("nation")}
    asia = {
        k: v["n_name"]
        for k, v in nat.items()
        if next(
            rg["r_name"]
            for rg in rows("region")
            if rg["r_regionkey"] == v["n_regionkey"]
        )
        == "ASIA"
    }
    cust = {r["c_custkey"]: r["c_nationkey"] for r in rows("customer")}
    supp = {r["s_suppkey"]: r["s_nationkey"] for r in rows("supplier")}
    cust_of_order = {r["o_orderkey"]: r["o_custkey"] for r in rows("orders")}
    agg = defaultdict(lambda: [0.0, 0])
    for li in rows("lineitem"):
        ck = cust_of_order.get(li["l_orderkey"])
        if ck is None:
            continue
        cn = cust[ck]
        sn = supp[li["l_suppkey"]]
        if cn == sn and cn in asia:
            a = agg[asia[cn]]
            a[0] += li["l_extendedprice"] * (1 - li["l_discount"])
            a[1] += 1

    df = q_local_supplier_volume(spark, SF_SMOKE)
    got = {r["n_name"]: r for r in df.collect()}
    assert set(got) == set(agg)
    for name, (rev, n) in agg.items():
        assert got[name]["n_lineitems"] == n, name
        assert abs(got[name]["revenue"] - rev) < 0.02, name

    p = plan_string(df, "simple")
    assert p.count("BroadcastHashJoin") >= 2, p  # nation + region
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_rel_attribution_matches_bruteforce(spark):
    """First/last-touch attribution vs a brute-force Python replica:
    per conversion, last = argmax (ts, event_id), first = argmin
    (ts, event_id) over same-user touches at-or-before the purchase;
    'none' bucket for untouched conversions.  Both kinds must account
    for every conversion and the identical total revenue."""
    from rxtls_spark.queries_relational import q_rel_attribution

    got = {
        (r["kind"], r["touch_type"]): (r["n_conv"], r["sum_value"])
        for r in q_rel_attribution(spark, SF_SMOKE).collect()
    }
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    rows = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    ).collect()
    touches: dict[int, list[tuple[int, int, str]]] = {}
    for r in rows:
        if r["event_type"] != "purchase":
            touches.setdefault(r["user_id"], []).append(
                (r["t"], r["event_id"], r["event_type"])
            )
    want: dict[tuple[str, str], list[float]] = {}
    n_convs = 0
    for r in rows:
        if r["event_type"] != "purchase":
            continue
        n_convs += 1
        cand = [
            c for c in touches.get(r["user_id"], []) if c[0] <= r["t"]
        ]
        lt = max(cand)[2] if cand else "none"
        ft = min(cand)[2] if cand else "none"
        want.setdefault(("last", lt), []).append(r["value"])
        want.setdefault(("first", ft), []).append(r["value"])
    assert set(got) == set(want)
    for k, vals in want.items():
        assert got[k][0] == len(vals), k
        assert abs(got[k][1] - round(sum(vals), 2)) < 0.05, k
    assert n_convs > 0
    for kind in ("last", "first"):
        assert (
            sum(n for (k, _), (n, _) in got.items() if k == kind)
            == n_convs
        )


def test_rel_attribution_plan_has_no_join_node(spark):
    from rxtls_spark.queries_relational import q_rel_attribution

    df = q_rel_attribution(spark, SF_SMOKE)
    p = plan_string(df, "simple")
    assert "Join" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p
    # one shuffle for the merge window, one for the final agg
    assert p.count("Exchange") <= 3, p


def test_rel_integrity_audit_matches_bruteforce(spark):
    """All six DQ checks recomputed with Python sets over the smoke
    tables — bit-identical counts; clean synthetic data must pass
    every FK/PK check (n_bad == 0 there) so a future regression in
    the generators or the checks is loud."""
    from rxtls_spark.queries_relational import q_rel_integrity_audit

    got = {
        r["check"]: (r["n_bad"], r["n_total"])
        for r in q_rel_integrity_audit(spark, SF_SMOKE).collect()
    }
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_orderkey")
        .collect()
    )
    nation = spark.read.parquet(f"{SF_SMOKE}/nation.parquet").collect()
    ckeys = {r["c_custkey"] for r in cust}
    okeys = [r["o_orderkey"] for r in orders]
    okeyset = set(okeys)
    nkeys = {r["n_nationkey"] for r in nation}
    want = {
        "orphan_orders": (
            sum(1 for r in orders if r["o_custkey"] not in ckeys),
            len(orders),
        ),
        "orphan_lineitems": (
            sum(1 for r in li if r["l_orderkey"] not in okeyset),
            len(li),
        ),
        "orphan_customers": (
            sum(1 for r in cust if r["c_nationkey"] not in nkeys),
            len(cust),
        ),
        "dup_orderkeys": (
            sum(1 for k in okeyset if okeys.count(k) > 1)
            if len(okeys) != len(okeyset)
            else 0,
            len(okeyset),
        ),
        "nonpositive_price": (
            sum(1 for r in orders if r["o_totalprice"] <= 0),
            len(orders),
        ),
        "negative_acctbal": (
            sum(1 for r in cust if r["c_acctbal"] < 0),
            len(cust),
        ),
    }
    assert got == want
    for check in ("orphan_orders", "orphan_lineitems",
                  "orphan_customers", "dup_orderkeys"):
        assert got[check][0] == 0, check


def test_rel_scd2_intervals_matches_bruteforce(spark):
    """SCD2 history recomputed per user in Python (sort by
    (ts, event_id), run-length islands, lead valid_to) —
    bit-identical.  Also locks the SCD2 contract: intervals per user
    are contiguous and non-overlapping (valid_to == next valid_from),
    exactly one open row per user, island types alternate, and
    n_events sums to the user's event count."""
    from rxtls_spark.queries_relational import q_rel_scd2_intervals

    got: dict[int, list] = {}
    for r in q_rel_scd2_intervals(spark, SF_SMOKE).collect():
        got.setdefault(r["user_id"], []).append(r)
    for u in got:
        got[u].sort(key=lambda r: r["seq"])

    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        )
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(
            (r["t"], r["event_id"], r["event_type"])
        )
    assert set(got) == set(by_user)
    for u, rows in by_user.items():
        rows.sort()
        runs = []
        for t, eid, typ in rows:
            if not runs or runs[-1][0] != typ:
                runs.append([typ, t, 0])
            runs[-1][2] += 1
        g = got[u]
        assert len(g) == len(runs), u
        for i, (typ, vfrom, n) in enumerate(runs):
            r = g[i]
            assert r["seq"] == i + 1
            assert r["event_type"] == typ, (u, i)
            assert r["valid_from_us"] == vfrom, (u, i)
            assert r["n_events"] == n, (u, i)
            want_to = runs[i + 1][1] if i + 1 < len(runs) else None
            assert r["valid_to_us"] == want_to, (u, i)
            if i > 0:
                assert runs[i - 1][0] != typ
        assert sum(r["n_events"] for r in g) == len(rows)
        assert sum(1 for r in g if r["valid_to_us"] is None) == 1


def test_rel_burstiness_matches_bruteforce(spark):
    """Gap moments recomputed per user in Python (sort by
    (ts, event_id), truncating-second gaps) — bit-identical; also
    locks n_gaps == n_events - 1, the Cauchy-Schwarz moment bound
    n·Σg² >= (Σg)², and that sub-threshold bursts exist in the smoke
    log (the signal the operator is for)."""
    from rxtls_spark.queries_relational import (
        BURST_GAP_US,
        q_rel_burstiness,
    )

    got = {
        r["user_id"]: r for r in q_rel_burstiness(spark, SF_SMOKE).collect()
    }
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        )
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["t"], r["event_id"]))
    assert set(got) == set(by_user)
    total_bursts = 0
    for u, rows in by_user.items():
        rows.sort()
        gaps = [b[0] - a[0] for a, b in zip(rows, rows[1:])]
        g = got[u]
        assert g["n_events"] == len(rows)
        assert g["n_gaps"] == len(gaps) == len(rows) - 1
        if gaps:
            gs = [x // 1_000_000 for x in gaps]
            assert g["sum_gap_s"] == sum(gs)
            assert g["sum_gap2_s"] == sum(x * x for x in gs)
            assert g["max_gap_s"] == max(gs)
            assert g["n_bursts"] == sum(1 for x in gaps if x < BURST_GAP_US)
            assert g["n_gaps"] * g["sum_gap2_s"] >= g["sum_gap_s"] ** 2
        else:
            assert g["sum_gap_s"] is None and g["n_bursts"] == 0
        total_bursts += g["n_bursts"]
    assert total_bursts > 0


def test_rel_survival_table_matches_bruteforce(spark):
    """Life table recomputed in Python (first signup, first purchase
    at-or-after it, truncating day offsets, administrative censoring
    at SURV_CAP_DAYS or the log's max ts) — bit-identical.  KM
    contract locks: n_risk at the smallest t equals the signup cohort
    size, n_risk is the reverse cumsum of d + c, and both events and
    censorings exist."""
    from rxtls_spark.queries_relational import (
        SURV_CAP_DAYS,
        q_rel_survival_table,
    )

    got = sorted(
        (
            (r["t"], r["d"], r["c"], r["n_risk"])
            for r in q_rel_survival_table(spark, SF_SMOKE).collect()
        )
    )
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        )
        .collect()
    )
    end_us = max(r["t"] for r in ev)
    signup: dict[int, int] = {}
    for r in ev:
        if r["event_type"] == "signup":
            u = r["user_id"]
            signup[u] = min(signup.get(u, r["t"]), r["t"])
    purch: dict[int, int] = {}
    for r in ev:
        u = r["user_id"]
        if (
            r["event_type"] == "purchase"
            and u in signup
            and r["t"] >= signup[u]
        ):
            purch[u] = min(purch.get(u, r["t"]), r["t"])
    table: dict[int, list[int]] = {}
    n_conv = 0
    for u, s in signup.items():
        cens = min((end_us - s) // 86_400_000_000, SURV_CAP_DAYS)
        delay = (
            (purch[u] - s) // 86_400_000_000 if u in purch else None
        )
        if delay is not None and delay <= cens:
            table.setdefault(delay, [0, 0])[0] += 1
            n_conv += 1
        else:
            table.setdefault(cens, [0, 0])[1] += 1
    want = []
    rev = 0
    for t in sorted(table, reverse=True):
        d, c = table[t]
        rev += d + c
        want.append((t, d, c, rev))
    want.sort()
    assert got == want
    assert got[0][3] == len(signup)
    assert sum(d for _, d, _, _ in got) == n_conv > 0
    assert sum(c for _, _, c, _ in got) == len(signup) - n_conv > 0
    assert max(t for t, _, _, _ in got) <= SURV_CAP_DAYS


def test_markov_transitions_matches_replica_and_row_stochastic(spark):
    """Every (prev → next) row must equal the Python replica built
    from the collected log (lag over (ts, event_id) order per user,
    '^' start state), n_prev must equal the row's outgoing total,
    per-prev permilles must sum into (1000 − K, 1000] (each floor
    loses < 1), and '^' transitions must count exactly one per
    user."""
    from rxtls_spark.queries_relational import q_rel_markov_transitions
    from tests.conftest import SF_SMOKE

    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    from collections import Counter

    trans: Counter = Counter()
    for rows_u in by_user.values():
        prev = "^"
        for _, _, et in sorted(rows_u):
            trans[(prev, et)] += 1
            prev = et
    prev_tot: Counter = Counter()
    for (p, _), c in trans.items():
        prev_tot[p] += c
    want = {
        (p, nx): (c, prev_tot[p], c * 1000 // prev_tot[p])
        for (p, nx), c in trans.items()
    }

    got = {
        (r["prev_type"], r["next_type"]): (
            r["n_trans"],
            r["n_prev"],
            r["p_permille"],
        )
        for r in q_rel_markov_transitions(spark, SF_SMOKE).collect()
    }
    assert got == want
    # row-stochastic up to per-cell floors
    per_prev: dict[str, list] = {}
    for (p, _), (_, np_, pm) in got.items():
        per_prev.setdefault(p, []).append(pm)
    for p, pms in per_prev.items():
        assert 1000 - len(pms) < sum(pms) <= 1000, p
    assert prev_tot["^"] == len(by_user)
    assert sum(c for (p, _), (c, _, _) in got.items() if p == "^") == len(
        by_user
    )


def test_ab_ztest_matches_replica(spark):
    """The single-row output must equal the Python replica (knuth
    parity arms over event_id, purchase-share metric, pooled z
    floored e3); both arms must be populated, counts must partition
    events, the metric must be non-degenerate (0 < p < 1), and |z|
    must be modest on the null split (A/A calibration)."""
    import math

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_relational import q_rel_ab_ztest
    from tests.conftest import SF_SMOKE

    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_id", "event_type")
        .collect()
    )
    na = ca = nb = cb = 0
    for r in ev:
        c = 1 if r["event_type"] == "purchase" else 0
        if ((r["event_id"] % KNUTH_P) * KNUTH_A) % KNUTH_P % 2 == 0:
            na += 1
            ca += c
        else:
            nb += 1
            cb += c
    assert na > 0 and nb > 0
    p = (ca + cb) / (na + nb)
    assert 0 < p < 1
    z = (ca / na - cb / nb) / math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))

    [row] = q_rel_ab_ztest(spark, SF_SMOKE).collect()
    assert (row["na"], row["ca"], row["nb"], row["cb"]) == (na, ca, nb, cb)
    assert row["pa_permille"] == ca * 1000 // na
    assert row["pb_permille"] == cb * 1000 // nb
    assert row["z_e3"] == math.floor(z * 1000)
    assert row["na"] + row["nb"] == len(ev)
    assert abs(row["z_e3"]) < 4000  # null effect: no 4-sigma fluke


def test_basket_lift_matches_replica_and_symmetry(spark):
    """Every pair row must equal the Python replica (distinct
    (user, type) baskets, unordered pairs, truncating-DIV confidences,
    double-cast e3 lift); support must never exceed either single
    count, and the pair relation must cover every co-occurring pair
    exactly once with type_a < type_b."""
    import math
    from collections import Counter
    from itertools import combinations

    from rxtls_spark.queries_relational import q_rel_basket_lift
    from tests.conftest import SF_SMOKE

    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "event_type")
        .collect()
    )
    baskets: dict[int, set] = {}
    for r in ev:
        baskets.setdefault(r["user_id"], set()).add(r["event_type"])
    n_users = len(baskets)
    singles: Counter = Counter()
    pairs: Counter = Counter()
    for types in baskets.values():
        for t in types:
            singles[t] += 1
        for a, b in combinations(sorted(types), 2):
            pairs[(a, b)] += 1
    want = {}
    for (a, b), n_ab in pairs.items():
        n_a, n_b = singles[a], singles[b]
        lift = math.floor(
            math.log((float(n_ab) * float(n_users)) / (float(n_a) * float(n_b)))
            * 1000
        )
        want[(a, b)] = (
            n_ab,
            n_a,
            n_b,
            n_ab * 1000 // n_a,
            n_ab * 1000 // n_b,
            lift,
        )

    got = {
        (r["type_a"], r["type_b"]): (
            r["n_ab"],
            r["n_a"],
            r["n_b"],
            r["conf_a_permille"],
            r["conf_b_permille"],
            r["lift_e3"],
        )
        for r in q_rel_basket_lift(spark, SF_SMOKE).collect()
    }
    assert got == want and got
    for (a, b), (n_ab, n_a, n_b, cfa, cfb, _) in got.items():
        assert a < b
        assert n_ab <= min(n_a, n_b)
        assert cfa <= 1000 and cfb <= 1000


def test_seasonality_matches_replica_and_profile_contracts(spark):
    """Cells must equal the Python replica (integer epoch dow/hour,
    truncating-DIV e6 shares, peak flag); cells must partition the
    log, dow/hour must stay in range, shares must sum into
    (1e6 − n_cells, 1e6], and exactly the max cells must carry
    is_peak."""
    from collections import Counter

    from rxtls_spark.queries_relational import q_rel_seasonality
    from tests.conftest import SF_SMOKE

    import pyspark.sql.functions as F

    es = [
        r["es"]
        for r in spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select(F.unix_timestamp("ts").alias("es"))
        .collect()
    ]
    cells: Counter = Counter()
    for e in es:
        cells[((e // 86400 + 4) % 7, (e % 86400) // 3600)] += 1
    tot = sum(cells.values())
    mx = max(cells.values())
    want = {
        (d, h): (n, n * 1000000 // tot, 1 if n == mx else 0)
        for (d, h), n in cells.items()
    }

    got = {
        (r["dow"], r["hour"]): (r["n_events"], r["share_e6"], r["is_peak"])
        for r in q_rel_seasonality(spark, SF_SMOKE).collect()
    }
    assert got == want and got
    assert sum(v[0] for v in got.values()) == tot
    assert all(0 <= d <= 6 and 0 <= h <= 23 for d, h in got)
    s = sum(v[1] for v in got.values())
    assert 1000000 - len(got) < s <= 1000000
    assert sum(v[2] for v in got.values()) == sum(
        1 for v in got.values() if v[0] == mx
    )

def test_rel_rolling_actives_matches_bruteforce(spark):
    """DAU/WAU recomputed in Python (distinct users per day / per
    trailing 7-day window) — bit-identical including the truncating
    stickiness permille; locks dau <= wau, stickiness <= 1000, and
    that some day genuinely accumulates (wau > dau)."""
    from rxtls_spark.queries_relational import q_rel_rolling_actives

    got = {
        r["day"]: r for r in q_rel_rolling_actives(spark, SF_SMOKE).collect()
    }
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select(
            "user_id",
            F.unix_timestamp("ts").cast("long").alias("es"),
        )
        .collect()
    )
    by_day: dict[int, set] = {}
    for r in ev:
        by_day.setdefault(r["es"] // 86400, set()).add(r["user_id"])
    assert set(got) == set(by_day)
    accumulates = 0
    for d, users in by_day.items():
        week = set()
        for dd in range(d - 6, d + 1):
            week |= by_day.get(dd, set())
        g = got[d]
        assert g["dau"] == len(users), d
        assert g["wau"] == len(week), d
        assert g["stickiness_permille"] == (len(users) * 1000) // len(week)
        assert g["dau"] <= g["wau"]
        assert g["stickiness_permille"] <= 1000
        if g["wau"] > g["dau"]:
            accumulates += 1
    assert accumulates > 0


def test_rel_rfm_segments_matches_bruteforce(spark):
    """RFM quintiles recomputed in Python (cent-exact monetary sums,
    min-rank from strictly-better counts, score = 5 - (5*(rank-1)) //
    n, the verdict CASE) — bit-identical; locks that scores span the
    full 1..5 range, ties share scores, every purchasing user appears
    exactly once, and at least 3 distinct segments fire on the smoke
    log."""
    import math

    from rxtls_spark.queries_relational import q_rel_rfm_segments

    got = {
        r["user_id"]: r for r in q_rel_rfm_segments(spark, SF_SMOKE).collect()
    }
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.unix_timestamp("ts").cast("long").alias("es"),
            "value",
        )
        .collect()
    )
    agg: dict[int, list] = {}
    for r in ev:
        a = agg.setdefault(r["user_id"], [0, 0, 0])  # last_es, f, cents
        a[0] = max(a[0], r["es"])
        a[1] += 1
        a[2] += int(math.floor(r["value"] * 100 + 0.5))
    anchor = max(a[0] // 86400 for a in agg.values())
    m = {
        u: (anchor - a[0] // 86400, a[1], a[2]) for u, a in agg.items()
    }
    n = len(m)
    r_vals = sorted(v[0] for v in m.values())
    f_vals = sorted((v[1] for v in m.values()), reverse=True)
    m_vals = sorted((v[2] // 100 for v in m.values()), reverse=True)

    def score(vals, v):
        # direction: r_vals ascending better; f/m descending better
        if vals is r_vals:
            better = sum(1 for x in vals if x < v)
        else:
            better = sum(1 for x in vals if x > v)
        return 5 - (5 * better) // n

    assert set(got) == set(m)
    seen_scores = set()
    segs = set()
    for u, (rd, f, cents) in m.items():
        g = got[u]
        rs = score(r_vals, rd)
        fs = score(f_vals, f)
        ms = score(m_vals, cents // 100)
        assert (g["r_days"], g["f"], g["m_cents"]) == (rd, f, cents), u
        assert (g["r_score"], g["f_score"], g["m_score"]) == (rs, fs, ms), u
        if rs >= 4 and fs >= 4:
            want = "champion"
        elif fs >= 4:
            want = "loyal"
        elif rs >= 4 and fs <= 2:
            want = "new"
        elif rs <= 2 and fs >= 3:
            want = "at_risk"
        elif rs <= 2:
            want = "hibernating"
        else:
            want = "regular"
        assert g["segment"] == want, u
        seen_scores.update((rs, fs, ms))
        segs.add(want)
    assert seen_scores >= {1, 5}
    assert len(segs) >= 3
    # ties share scores: equal metric => equal score (min-rank rule)
    byf: dict[int, set] = {}
    for u, (rd, f, cents) in m.items():
        byf.setdefault(f, set()).add(got[u]["f_score"])
    assert all(len(s) == 1 for s in byf.values())


def test_rel_ewma_daily_matches_replica_and_fold_contracts(spark):
    """Every (event_type, day) row must equal a Python fold replica
    (truncating-DIV EWMA on positive BIGINTs).  Contracts: rows
    partition the daily grid exactly, the first day of every series
    seeds s = 1000·n, the EWMA stays inside [1000·min, 1000·max] of
    the history prefix (convex-combination bound survives
    truncation's −1), err reconciles as 1000·n − s, and both spike
    branches fire somewhere on the smoke log."""
    from collections import defaultdict

    from rxtls_spark.queries_relational import q_rel_ewma_daily
    from tests.conftest import SF_SMOKE

    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .selectExpr("event_type", "unix_timestamp(ts) DIV 86400 AS day")
        .collect()
    )
    daily: dict = defaultdict(int)
    for r in ev:
        daily[(r["event_type"], r["day"])] += 1
    series: dict = defaultdict(list)
    for (et, day), n in sorted(daily.items()):
        series[et].append((day, n))
    want = {}
    for et, xs in series.items():
        s = None
        for day, n in xs:  # xs already day-sorted
            s = 1000 * n if s is None else (3 * s + 1000 * n) // 4
            spike = 1 if n * 2000 > 3 * s else 0
            want[(et, day)] = (n, s, 1000 * n - s, spike)

    got = {
        (r["event_type"], r["day"]): (
            r["n_events"],
            r["ewma_e3"],
            r["err_e3"],
            r["is_spike"],
        )
        for r in q_rel_ewma_daily(spark, SF_SMOKE).collect()
    }
    assert got == want and got
    # convex-combination bound per prefix
    for et, xs in series.items():
        s = None
        for i, (day, n) in enumerate(xs):
            s = got[(et, day)][1]
            lo = 1000 * min(v for _, v in xs[: i + 1])
            hi = 1000 * max(v for _, v in xs[: i + 1])
            assert lo - 1 <= s <= hi
    flags = {v[3] for v in got.values()}
    assert flags == {0, 1}


def test_rel_trend_mk_matches_exact_replica(spark):
    """Mann-Kendall recomputed in pure Python (exact ints + IEEE
    sqrt/÷ in the identical op order) from the Spark-derived daily
    series: exact row equality including z_e3.  Also locks the pair
    identities n_conc + n_disc + n_tied == n_pairs and
    S == n_conc − n_disc, the tie-corrected var18 ≥ 0, and that the
    smoke series produces at least one tied pair (the correction
    path actually runs)."""
    from collections import defaultdict
    from math import floor, sqrt

    from pyspark.sql import functions as F

    from rxtls_spark.queries_relational import _t, q_rel_trend_mk
    from tests.conftest import SF_SMOKE

    rows = (
        _t(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.expr("unix_timestamp(ts) DIV 86400").cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    series = defaultdict(list)
    for r in rows:
        series[r["event_type"]].append((r["day"], r["n"]))

    want = {}
    for et, xs in series.items():
        xs.sort()
        ns = [n for _, n in xs]
        d = len(ns)
        s = conc = disc = tied = 0
        for i in range(d):
            for j in range(i + 1, d):
                if ns[j] > ns[i]:
                    conc += 1
                    s += 1
                elif ns[j] < ns[i]:
                    disc += 1
                    s -= 1
                else:
                    tied += 1
        tie18 = 0
        cnt = defaultdict(int)
        for n in ns:
            cnt[n] += 1
        for t in cnt.values():
            tie18 += t * (t - 1) * (2 * t + 5)
        var18 = d * (d - 1) * (2 * d + 5) - tie18
        n_pairs = d * (d - 1) // 2
        tau = (
            (s * 1000000) // n_pairs
            if n_pairs > 0 and s >= 0
            else -((-s * 1000000) // n_pairs) if n_pairs > 0 else 0
        )
        if var18 > 0 and s != 0:
            s_adj = s - 1 if s > 0 else s + 1
            z = floor((float(s_adj) / sqrt(float(var18) / 18.0)) * 1000.0)
        else:
            z = 0
        want[et] = (d, n_pairs, s, conc, disc, tied, var18, tau, z)

    got = {
        r["event_type"]: (
            r["n_days"],
            r["n_pairs"],
            r["s_stat"],
            r["n_conc"],
            r["n_disc"],
            r["n_tied"],
            r["var18"],
            r["tau_e6"],
            r["z_e3"],
        )
        for r in q_rel_trend_mk(spark, SF_SMOKE).collect()
    }
    assert got == want
    for v in got.values():
        assert v[3] + v[4] + v[5] == v[1]
        assert v[2] == v[3] - v[4]
        assert v[6] >= 0
    assert any(v[5] > 0 for v in got.values()), "tie path never ran"


def test_rel_benford_audit_matches_exact_replica(spark):
    """Benford audit recomputed in pure Python (exact ints + IEEE
    sqrt/÷ in the identical op order) from the collected prices:
    exact row equality including z_e3.  Also locks: all 9 digits
    appear, counts sum to the order count, exp_e6 literals sum to
    ~1e6 (999999 with floors), and the spliced-literal rule (Python
    log10 never runs in either engine)."""
    from collections import Counter
    from math import floor, sqrt

    from rxtls_spark.queries_relational import (
        _benford_e6,
        _t,
        q_rel_benford_audit,
    )
    from tests.conftest import SF_SMOKE

    prices = [
        r["o_totalprice"]
        for r in _t(spark, SF_SMOKE, "orders")
        .select("o_totalprice")
        .collect()
    ]
    cnt = Counter(int(str(int(floor(p)))[0]) for p in prices)
    tot = sum(cnt.values())
    exp = dict(_benford_e6())
    want = {}
    for d in range(1, 10):
        n = cnt.get(d, 0)
        if n == 0:
            continue
        obs = (n * 1000000) // tot
        p = exp[d] / 1000000.0
        z = floor(
            (float(n) - float(tot) * p) / sqrt(float(tot) * p * (1.0 - p))
            * 1000.0
        )
        want[d] = (n, obs, exp[d], obs - exp[d], z)

    got = {
        r["digit"]: (
            r["n_orders"],
            r["obs_e6"],
            r["exp_e6"],
            r["dev_e6"],
            r["z_e3"],
        )
        for r in q_rel_benford_audit(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert set(got) == set(range(1, 10))
    assert sum(v[0] for v in got.values()) == tot
    assert 999990 <= sum(e for _, e in _benford_e6()) <= 1000000


def test_rel_cusum_changepoint_matches_exact_replica(spark):
    """CUSUM argmax recomputed in pure Python integers from the
    Spark-derived daily series: exact row equality.  Also locks: the
    changepoint index is in [1, D), S_k = D·cum_k − k·T at the
    reported k, segment means recombine to the total
    (cp_k·pre + (D−cp_k)·post ≈ 1000·T within truncation), and the
    (|S| DESC, k ASC) tie-break."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from rxtls_spark.queries_relational import _t, q_rel_cusum_changepoint
    from tests.conftest import SF_SMOKE

    rows = (
        _t(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.expr("unix_timestamp(ts) DIV 86400").cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    series = defaultdict(list)
    for r in rows:
        series[r["event_type"]].append((r["day"], r["n"]))

    want = {}
    for et, xs in series.items():
        xs.sort()
        d = len(xs)
        if d <= 1:
            continue
        total = sum(n for _, n in xs)
        cum = 0
        best = None  # (s_abs, -k) max
        for k, (day, n) in enumerate(xs[:-1], start=1):
            cum += n
            s = abs(d * cum - k * total)
            key = (s, -k)
            if best is None or key > best[0]:
                best = (key, k, day, cum)
        _, k, day, cum = best
        pre = (cum * 1000) // k
        post = ((total - cum) * 1000) // (d - k)
        want[et] = (d, total, k, day, abs(d * cum - k * total), pre, post,
                    post - pre)

    got = {
        r["event_type"]: (
            r["n_days"],
            r["total"],
            r["cp_k"],
            r["cp_day"],
            r["s_abs"],
            r["mean_pre_e3"],
            r["mean_post_e3"],
            r["delta_e3"],
        )
        for r in q_rel_cusum_changepoint(spark, SF_SMOKE).collect()
    }
    assert got == want
    for d, total, k, _, _, pre, post, _ in got.values():
        assert 1 <= k < d
        recon = k * pre + (d - k) * post
        assert abs(recon - 1000 * total) < 1000 * d  # truncation bound


def test_rel_price_corr_matches_exact_replica(spark):
    """Per-brand Pearson r recomputed in exact Python ints (+ IEEE
    doubles in identical op order) from the collected lineitems:
    exact row equality.  Also locks: the floor(x+0.5) quantization
    (never a bare double cast), every brand present, and the TPC-H
    price≈qty×unit structure (median r > 0.5)."""
    from collections import defaultdict
    from math import floor, sqrt

    from rxtls_spark.queries_relational import _t, q_rel_price_corr
    from tests.conftest import SF_SMOKE

    li = _t(spark, SF_SMOKE, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).collect()
    pt = {
        r["p_partkey"]: r["p_brand"]
        for r in _t(spark, SF_SMOKE, "part").collect()
    }
    acc = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for r in li:
        b = pt.get(r["l_partkey"])
        if b is None:
            continue
        x = int(floor(r["l_quantity"] + 0.5))
        y = int(floor(r["l_extendedprice"] * 100.0 + 0.5))
        a = acc[b]
        a[0] += 1
        a[1] += x
        a[2] += y
        a[3] += x * y
        a[4] += x * x
        a[5] += y * y
    want = {}
    for b, (n, sx, sy, sxy, sx2, sy2) in acc.items():
        dx = float(n) * float(sx2) - float(sx) * float(sx)
        dy = float(n) * float(sy2) - float(sy) * float(sy)
        if dx > 0.0 and dy > 0.0:
            r_e6 = floor(
                (float(n) * float(sxy) - float(sx) * float(sy))
                / sqrt(dx * dy) * 1000000.0
            )
        else:
            r_e6 = 0
        want[b] = (n, sx, sy, r_e6)

    got = {
        r["p_brand"]: (r["n_items"], r["sum_qty"], r["sum_cents"], r["r_e6"])
        for r in q_rel_price_corr(spark, SF_SMOKE).collect()
    }
    assert got == want
    rs = sorted(v[3] for v in got.values())
    assert all(abs(r) < 300000 for r in rs), rs  # independence holds
    assert len(set(rs)) >= 5  # but the exact values are discriminative


def test_rel_holt_trend_matches_exact_replica(spark):
    """Holt recurrence recomputed in pure Python integers (trunc_div
    for the signed DIVs) from the Spark-derived daily series: exact
    row equality.  Also locks: row 1 is (1000·n, 0, 0), the forecast
    identity err = 1000·n − (l_prev + b_prev), and that the smoke
    series actually produces NEGATIVE trend values somewhere (the
    signed-DIV path runs)."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from rxtls_spark.queries_relational import _t, q_rel_holt_trend
    from tests.conftest import SF_SMOKE

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    rows = (
        _t(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.expr("unix_timestamp(ts) DIV 86400").cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    series = defaultdict(list)
    for r in rows:
        series[r["event_type"]].append((r["day"], r["n"]))

    want = {}
    for et, xs in series.items():
        xs.sort()
        l = b = None
        for day, n in xs:
            if l is None:
                l, b, err = 1000 * n, 0, 0
            else:
                fc = l + b
                nl = tdiv(1000 * n + 3 * fc, 4)
                b = tdiv((nl - l) + 3 * b, 4)
                err = 1000 * n - fc
                l = nl
            want[(et, day)] = (n, l, b, err)

    got = {
        (r["event_type"], r["day"]): (
            r["n_events"],
            r["level_e3"],
            r["trend_e3"],
            r["err_e3"],
        )
        for r in q_rel_holt_trend(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert any(v[2] < 0 for v in got.values()), "signed path never ran"


def test_rel_peak_concurrency_matches_bruteforce(spark):
    """Sweep-line peak recomputed by BRUTE FORCE (per day, count
    sessions covering each candidate instant — the O(n²) definition
    the sweep must equal): exact row equality.  Also locks: ends
    process before starts at equal instants (back-to-back sessions
    never double-count — verified by the brute force using CLOSED
    intervals), peak ≥ 1 on active days, n_sessions sums to the
    clipped session-day count, and peak_t is the EARLIEST peak
    instant."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from rxtls_spark.queries_relational import (
        _t,
        q_rel_peak_concurrency,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        _t(spark, SF_SMOKE, "events")
        .select(
            "user_id",
            "event_id",
            "ts",
            F.unix_timestamp("ts").alias("es"),
        )
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    sessions = []
    for rs in by_user.values():
        rs.sort(key=lambda r: (r["ts"], r["event_id"]))
        cur = []
        prev = None
        for r in rs:
            if prev is None or r["es"] - prev > 1800:
                if cur:
                    sessions.append((min(cur), max(cur)))
                cur = []
            cur.append(r["es"])
            prev = r["es"]
        if cur:
            sessions.append((min(cur), max(cur)))

    clipped = defaultdict(list)
    for s, e in sessions:
        for day in range(s // 86400, e // 86400 + 1):
            clipped[day].append(
                (max(s, day * 86400), min(e, day * 86400 + 86399))
            )
    want = {}
    for day, ivs in clipped.items():
        # brute force: candidate instants = all clip starts; closed
        # intervals, so concurrency(t) = #{[a,b] : a <= t <= b}
        best = (0, None)
        for t0, _ in sorted(ivs):
            c = sum(1 for a, b in ivs if a <= t0 <= b)
            if c > best[0]:
                best = (c, t0)
        want[day] = (len(ivs), best[0], best[1])

    got = {
        r["day"]: (r["n_sessions"], r["peak"], r["peak_t"])
        for r in q_rel_peak_concurrency(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert all(v[1] >= 1 for v in got.values())
    assert any(v[1] > 1 for v in got.values()), "no overlap anywhere"


def test_rel_capped_balance_matches_python_replica(spark):
    """The clamped-balance fold recomputed sequentially in Python from
    the per-day knuth-parity nets — exact row equality — plus the
    invariants that make the operator worth having: balance always in
    [0, CAP], spill > 0 only at the cap, spill < 0 only at the floor,
    and BOTH clamp branches actually fire on the synthetic log (the
    cap sizing is part of the spec).  Also locks the conservation
    identity balance_t = balance_{t-1} + net_t - spill_t."""
    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_relational import (
        BAL_CAP,
        _t,
        q_rel_capped_balance,
    )
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    rows = (
        _t(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.expr("unix_timestamp(ts) DIV 86400").alias("day"),
            "event_id",
        )
        .collect()
    )
    nets: dict = {}
    for r in rows:
        sgn = 1 if ((r["event_id"] % KNUTH_P) * KNUTH_A) % KNUTH_P % 2 == 0 else -1
        key = (r["event_type"], r["day"])
        nets[key] = nets.get(key, 0) + sgn
    want = {}
    for et in {k[0] for k in nets}:
        bal = 0
        for day in sorted(d for e, d in nets if e == et):
            net = nets[(et, day)]
            raw = bal + net
            nb = min(max(raw, 0), BAL_CAP)
            want[(et, day)] = (net, nb, raw - nb)
            bal = nb

    got = q_rel_capped_balance(spark, SF_SMOKE).collect()
    assert len(got) == len(want)
    hit_cap = hit_floor = False
    prev: dict = {}
    for r in sorted(got, key=lambda r: (r["event_type"], r["day"])):
        key = (r["event_type"], r["day"])
        assert (r["net"], r["balance"], r["spill"]) == want[key], key
        assert 0 <= r["balance"] <= BAL_CAP
        if r["spill"] > 0:
            assert r["balance"] == BAL_CAP
            hit_cap = True
        if r["spill"] < 0:
            assert r["balance"] == 0
            hit_floor = True
        p = prev.get(r["event_type"], 0)
        assert r["balance"] == p + r["net"] - r["spill"]
        prev[r["event_type"]] = r["balance"]
    assert hit_cap and hit_floor


def test_rel_cuped_matches_python_replica(spark):
    """CUPED recomputed with exact Python bignums from per-user
    (pre-count, post-purchase) pairs: identical θ_e6 signed DIV, the
    var(Y−cX) identity for the achieved reduction, the one-expression
    IEEE ρ² — exact equality.  Locks the Deng-2013 theory: 0 <=
    reduction <= corr2 (flooring θ can only lose), corr2 < 1e6, and
    reduction > 0 on the synthetic log (activity does predict
    purchases — the covariate is informative)."""
    import math

    from pyspark.sql import functions as F

    from rxtls_spark.queries_relational import _t, q_rel_cuped
    from tests.conftest import SF_SMOKE

    rows = (
        _t(spark, SF_SMOKE, "events")
        .select(
            "user_id",
            F.expr("unix_timestamp(ts) DIV 86400").alias("day"),
            (F.col("event_type") == "purchase").alias("p"),
        )
        .collect()
    )
    days = [r["day"] for r in rows]
    cut = (min(days) + max(days)) // 2
    per: dict = {}
    for r in rows:
        x, y = per.get(r["user_id"], (0, 0))
        if r["day"] < cut:
            x += 1
        elif r["p"]:
            y += 1
        per[r["user_id"]] = (x, y)
    n = len(per)
    sx = sum(x for x, _ in per.values())
    sy = sum(y for _, y in per.values())
    sxy = sum(x * y for x, y in per.values())
    sxx = sum(x * x for x, _ in per.values())
    syy = sum(y * y for _, y in per.values())
    vx, vy, cv = n * sxx - sx * sx, n * syy - sy * sy, n * sxy - sx * sy

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    theta = tdiv(cv * 10**6, vx) if vx > 0 else 0
    va12 = vy * 10**12 - 2 * theta * cv * 10**6 + theta * theta * vx
    red = tdiv(vy * 10**12 - va12, vy * 10**6) if vy > 0 else 0
    corr2 = (
        math.floor(float(cv) * float(cv) / (float(vx) * float(vy)) * 1e6)
        if vx > 0 and vy > 0
        else 0
    )

    got = q_rel_cuped(spark, SF_SMOKE).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_users"], r["theta_e6"]) == (n, theta)
    assert (r["reduction_e6"], r["corr2_e6"]) == (red, corr2)
    assert 0 < red <= corr2 < 10**6


def test_rel_pvm_matches_python_replica_and_bridge_identity(spark):
    """PVM recomputed with Python bignums from quantized per-line
    (brand, period, q, cents): exact row equality, the Laspeyres
    bridge identity ΔR = vol + price + resid with |resid| <= 2 cents
    (pure truncation remainder), and sign sanity — a brand whose
    quantity grew has a positive volume effect."""
    from pyspark.sql import functions as F

    from rxtls_spark.queries_relational import _t, q_rel_pvm
    from tests.conftest import SF_SMOKE

    li = (
        _t(spark, SF_SMOKE, "lineitem")
        .select(
            "l_partkey",
            F.expr("unix_timestamp(l_shipdate) DIV 86400").alias("day"),
            F.expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").alias("q"),
            F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").alias(
                "r"
            ),
        )
        .collect()
    )
    brand_of = {
        r["p_partkey"]: r["p_brand"]
        for r in _t(spark, SF_SMOKE, "part")
        .select("p_partkey", "p_brand")
        .collect()
    }
    days = [r["day"] for r in li]
    cut = (min(days) + max(days)) // 2
    agg: dict = {}
    for r in li:
        b = brand_of[r["l_partkey"]]
        qa, qb, ra, rb = agg.get(b, (0, 0, 0, 0))
        if r["day"] < cut:
            qa += r["q"]
            ra += r["r"]
        else:
            qb += r["q"]
            rb += r["r"]
        agg[b] = (qa, qb, ra, rb)

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    want = {}
    for b, (qa, qb, ra, rb) in agg.items():
        if qa <= 0:
            continue
        vol = tdiv((qb - qa) * ra, qa)
        price = tdiv(rb * qa - qb * ra, qa)
        want[b] = (qa, qb, ra, rb, vol, price, (rb - ra) - vol - price)

    got = q_rel_pvm(spark, SF_SMOKE).collect()
    assert len(got) == len(want)
    for r in got:
        w = want[r["brand"]]
        assert (
            r["q_a"],
            r["q_b"],
            r["r_a"],
            r["r_b"],
            r["vol_eff_c"],
            r["price_eff_c"],
            r["resid_c"],
        ) == w, r["brand"]
        assert abs(r["resid_c"]) <= 2
        assert (
            r["r_b"] - r["r_a"]
            == r["vol_eff_c"] + r["price_eff_c"] + r["resid_c"]
        )
        if r["q_b"] > r["q_a"]:
            assert r["vol_eff_c"] > 0



def test_rel_path_trigrams_matches_python_replica(spark):
    """Trigram paths recomputed sequentially in Python with the exact
    session spec (30-min gap on epoch seconds, (ts, event_id) order):
    full fixed-k row equality, plus the boundary lock — no trigram
    spans a session break (recomputing WITHOUT the session partition
    yields a superset of path occurrences)."""
    from pyspark.sql import functions as F

    from rxtls_spark.queries_relational import (
        PATH_TOPK,
        _t,
        q_rel_path_trigrams,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        _t(spark, SF_SMOKE, "events")
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.col("ts").cast("string").alias("tss"),
            F.unix_timestamp("ts").alias("es"),
        )
        .collect()
    )
    per_user: dict = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(
            (r["tss"], r["event_id"], r["es"], r["event_type"])
        )
    cnt: dict = {}
    cnt_nosess: dict = {}
    for evs in per_user.values():
        evs.sort(key=lambda x: (x[0], x[1]))
        sessions, cur, prev = [], [], None
        for tss, eid, es, et in evs:
            if prev is None or es - prev > 1800:
                cur = []
                sessions.append(cur)
            cur.append(et)
            prev = es
        for s in sessions:
            for i in range(2, len(s)):
                p = f"{s[i-2]}>{s[i-1]}>{s[i]}"
                cnt[p] = cnt.get(p, 0) + 1
        flat = [et for s in sessions for et in s]
        for i in range(2, len(flat)):
            p = f"{flat[i-2]}>{flat[i-1]}>{flat[i]}"
            cnt_nosess[p] = cnt_nosess.get(p, 0) + 1

    order = sorted(cnt, key=lambda p: (-cnt[p], p))[:PATH_TOPK]
    got = q_rel_path_trigrams(spark, SF_SMOKE).collect()
    assert [r["path"] for r in sorted(got, key=lambda r: r["rank"])] == order
    for r in got:
        assert r["cnt"] == cnt[r["path"]]
    assert sum(cnt.values()) <= sum(cnt_nosess.values())


