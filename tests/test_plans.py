"""Plan-shape assertions — the scale contract, enforced in CI.

At 100 TB the difference between a broadcast join and a shuffled join
on the page stream is the whole job; these tests pin the plan shapes
so a refactor can't silently regress them (SURVEY §4)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def flagship_df(spark):
    from rxtls_spark.datagen.lookups import log_operators_df
    from rxtls_spark.datagen.pages import pages_df
    from rxtls_spark.pipeline import enriched

    return enriched(pages_df(spark, SF_SMOKE), log_operators_df(spark))


def test_operator_enrich_is_broadcast(spark, flagship_df):
    from rxtls_spark.plans.checks import has_broadcast_join, has_shuffle_join

    assert has_broadcast_join(flagship_df)
    # the page stream must NEVER be shuffled for lookup enrichment
    assert not has_shuffle_join(flagship_df)


def test_flagship_has_no_shuffle_before_aggregate(spark, flagship_df):
    from rxtls_spark.plans.checks import count_exchanges

    # parse→enrich→route is exchange-free; only the final groupBy adds
    # one partial+final hash-agg exchange
    assert count_exchanges(flagship_df) == 0
    agg = flagship_df.groupBy("route").count()
    assert count_exchanges(agg) == 1


def test_no_shuffle_or_nested_loop_joins(spark, flagship_df):
    """The flagship plan's only join is the broadcast operator lookup —
    the suffix route compiles to a literal-map expression (no join
    node), and nothing shuffles or nested-loops the page stream."""
    from rxtls_spark.plans.checks import plan_string, shuffle_join_kinds

    assert shuffle_join_kinds(flagship_df) == []
    assert plan_string(flagship_df, mode="simple").count("BroadcastHashJoin") == 1


def test_filter_pushdown_reaches_parquet(spark):
    from rxtls_spark.plans.checks import pushed_filters

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    q = docs.where(F.col("doc_id") > 100).select("doc_id", "lang")
    filters = pushed_filters(q)
    assert any("GreaterThan(doc_id,100)" in f for f in filters), filters


def test_column_pruning_reaches_parquet(spark):
    from rxtls_spark.plans.checks import read_schema_columns

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    q = docs.select("doc_id", "lang")
    cols = read_schema_columns(q)
    assert cols == {"doc_id", "lang"}, cols


def test_pages_generation_prunes_documents_columns(spark):
    """The pages synthesis must not drag source/n_chars through the
    mapInPandas boundary."""
    from rxtls_spark.datagen.pages import pages_df
    from rxtls_spark.plans.checks import read_schema_columns

    cols = read_schema_columns(pages_df(spark, SF_SMOKE))
    assert cols == {"doc_id", "text", "lang"}, cols


def test_relational_broadcast_choice(spark):
    """nation/region joins broadcast; customer×orders may shuffle (both
    large at 100 TB) — exactly the strategies SURVEY §2.3 prescribes."""
    from rxtls_spark.plans.checks import has_broadcast_join
    from rxtls_spark.queries_relational import q_supplier_by_region

    assert has_broadcast_join(q_supplier_by_region(spark, SF_SMOKE))


def test_codegen_covers_jvm_stages(spark, flagship_df):
    from rxtls_spark.plans.checks import codegen_stage_count

    assert codegen_stage_count(flagship_df.groupBy("route").count()) >= 1


def test_parse_udf_evaluated_exactly_once(spark):
    """Filter-then-expand used to plan the parse UDF TWICE (one
    ArrowEvalPython feeding the Filter, a second for the projection) —
    2x the Python cost of the whole pipeline.  Lock single evaluation
    for every parse entry point."""
    from rxtls_spark.datagen.lookups import log_operators_df
    from rxtls_spark.datagen.pages import pages_df
    from rxtls_spark.pipeline import enriched, parsed_flat, route_counts
    from rxtls_spark.plans.checks import plan_string

    pages = pages_df(spark, SF_SMOKE)
    ops = log_operators_df(spark)

    def n_udf_evals(df):
        return plan_string(df, mode="simple").count("ArrowEvalPython")

    assert n_udf_evals(parsed_flat(pages)) == 1
    assert n_udf_evals(route_counts(pages, ops)) == 1
    assert n_udf_evals(enriched(pages, ops)) == 1
    agg = enriched(pages, ops).groupBy("route").count()
    assert n_udf_evals(agg) == 1


def test_training_query_plan_shapes(spark):
    """Round-3 operators keep the plan shapes that survive 100x scale:
    contamination's only join is the broadcast of the (tiny) eval
    shingle set — never a sort-merge over the corpus — and pii_scrub is
    a pure map (zero exchanges) over a pruned 2-column scan."""
    from rxtls_spark.plans.checks import count_exchanges, plan_string
    from rxtls_spark.queries_training import q_contamination, q_pii_scrub

    cont = q_contamination(spark, SF_SMOKE)
    p = plan_string(cont, "simple")
    assert p.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in p
    # eval-set distinct + final per-doc partial agg — nothing else
    assert count_exchanges(cont) == 2

    pii = q_pii_scrub(spark, SF_SMOKE)
    assert count_exchanges(pii) == 0
    assert "struct<doc_id:bigint,text:string>" in plan_string(pii, "formatted")


def test_round3_training_plan_shapes(spark):
    """Scale locks for the round-3 training operators: repetition is a
    pure per-row map (zero exchanges — the whole point of the fold
    implementation vs an explode+groupBy), sequence packing shuffles
    exactly once (the shard partitioning), and mixture sampling never
    sort-merge-joins the corpus — its only joins are broadcasts of the
    5-row rate table."""
    from rxtls_spark.plans.checks import (
        count_exchanges,
        plan_string,
        shuffle_join_kinds,
    )
    from rxtls_spark.queries_training import (
        q_mixture_sample,
        q_repetition,
        q_sequence_pack,
    )

    rep = q_repetition(spark, SF_SMOKE)
    assert count_exchanges(rep) == 0
    assert shuffle_join_kinds(rep) == []

    pack = q_sequence_pack(spark, SF_SMOKE)
    assert count_exchanges(pack) == 1
    assert shuffle_join_kinds(pack) == []

    mix = q_mixture_sample(spark, SF_SMOKE)
    p = plan_string(mix, "simple")
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_sample_and_compaction_plan_shapes(spark):
    """corpus_sample must plan as TakeOrderedAndProject (per-partition
    top-k + driver merge — NO global sort exchange); the compaction
    planner is join-free with exactly its two window/agg exchanges."""
    from rxtls_spark.plans.checks import (
        count_exchanges,
        plan_string,
        shuffle_join_kinds,
    )
    from rxtls_spark.queries_relational import q_sink_compaction
    from rxtls_spark.queries_training import q_corpus_sample

    cs = q_corpus_sample(spark, SF_SMOKE)
    p = plan_string(cs, "simple")
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p
    assert count_exchanges(cs) == 0

    comp = q_sink_compaction(spark, SF_SMOKE)
    assert count_exchanges(comp) == 2
    assert shuffle_join_kinds(comp) == []


def test_round4_training_plan_shapes(spark):
    """Round-4 scale locks: the broadcast-vocab lm_score path runs its
    pandas UDF EXACTLY once (Catalyst duplicates deterministic UDF
    expressions across projections — the r2 parse-path trap) and stays
    a pure map (0 exchanges, join-free); the approx quality gate has no
    Window and one partial-agg exchange (locked in test_text.py too)."""
    from rxtls_spark.plans.checks import (
        count_exchanges,
        plan_string,
        shuffle_join_kinds,
    )
    from rxtls_spark.queries_training import q_lm_score_broadcast

    lm = q_lm_score_broadcast(spark, SF_SMOKE)
    p = plan_string(lm, "simple")
    assert p.count("ArrowEvalPython") == 1, p
    assert count_exchanges(lm) == 0
    assert shuffle_join_kinds(lm) == []


def test_round5_training_plan_shapes(spark):
    """Round-5 scale locks.  shuffle_shards: the epoch shuffle is ONE
    exchange (hash-partitioned on shard) + in-partition sort + Window
    — never a global sort, no UDF, no join.  logreg: the per-iteration
    gradient agg over the feature projection is one partial-agg
    exchange, join/window/UDF free (the kmeans loop shape)."""
    from rxtls_spark.plans.checks import (
        count_exchanges,
        plan_string,
        shuffle_join_kinds,
    )
    from rxtls_spark.queries_training import (
        _docs,
        logreg_features,
        q_shuffle_shards,
    )

    sh = q_shuffle_shards(spark, SF_SMOKE)
    p = plan_string(sh, "simple")
    assert count_exchanges(sh) == 1, p
    assert "Window" in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p
    assert shuffle_join_kinds(sh) == []
    # partitioned window, not a global sort: the Sort node is the
    # window's local sort, so no Exchange rangepartitioning appears
    assert "rangepartitioning" not in plan_string(sh, "formatted").lower(), p

    fx = logreg_features(_docs(spark, SF_SMOKE))
    g = fx.agg(*[F.sum(F.col(c)).alias(c) for c in ("x1", "x2", "x3", "y")])
    gp = plan_string(g, "simple")
    # <=1: at SF_SMOKE the source is a single partition and the global
    # agg needs no exchange at all; at scale it is exactly one
    assert count_exchanges(g) <= 1, gp
    assert "Window" not in gp and "Join" not in gp, gp
    assert "ArrowEvalPython" not in gp and "BatchEvalPython" not in gp, gp


def test_r5_planner_and_sketch_plan_shapes(spark):
    """Late round-5 scale locks.  proto_prune: centroid scoring must
    stay a pure per-row map against literal centroids (0 joins, no
    UDF) with the ONE exchange being the per-cell window.  cms: the
    corpus touches exactly 2 shuffle exchanges (sketch agg + exact
    anchor agg) and the sketch rides a broadcast, never a shuffled
    join.  holdout_split / token_budget: single partial-agg exchange,
    join/UDF free."""
    from rxtls_spark.plans.checks import (
        count_exchanges,
        plan_string,
        shuffle_join_kinds,
    )
    from rxtls_spark.queries_training import (
        q_cms_heavy_hitters,
        q_holdout_split,
        q_proto_prune,
        q_token_budget,
    )

    pp = q_proto_prune(spark, SF_SMOKE)
    p = plan_string(pp, "simple")
    assert count_exchanges(pp) == 1, p
    assert "Join" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p

    cms = q_cms_heavy_hitters(spark, SF_SMOKE)
    p = plan_string(cms, "simple")
    assert count_exchanges(cms) == 2, p
    assert "BroadcastExchange" in p, p
    assert shuffle_join_kinds(cms) == [], p

    for q in (q_holdout_split, q_token_budget):
        df = q(spark, SF_SMOKE)
        p = plan_string(df, "simple")
        assert count_exchanges(df) == 1, (q.__name__, p)
        assert "Join" not in p, (q.__name__, p)
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p

    # logreg_infer: training collects happen while BUILDING the plan;
    # the returned scoring plan itself is a pure map — 0 exchanges,
    # no join, no UDF (the 100-TB quality-filter shape)
    from rxtls_spark.queries_training import q_logreg_infer

    inf = q_logreg_infer(spark, SF_SMOKE)
    p = plan_string(inf, "simple")
    assert count_exchanges(inf) == 0, p
    assert "Join" not in p and "Window" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p

    # unimax_sample: the planner agg runs at build time; the returned
    # sampler plan is scan → pure map → broadcast join with the
    # bounded plan — 0 shuffle exchanges, no window, no skewed
    # per-stratum cumsum anywhere
    from rxtls_spark.queries_training import q_unimax_sample

    um = q_unimax_sample(spark, SF_SMOKE)
    p = plan_string(um, "simple")
    assert count_exchanges(um) == 0, p
    assert "BroadcastExchange" in p and "Window" not in p, p
    assert shuffle_join_kinds(um) == [], p


def test_r5_text_pipeline_plan_shapes(spark):
    """Late round-5 scale locks (part 2).  filter_cascade: the ENTIRE
    FineWeb-style gate funnel is one Catalyst projection — 0 exchanges,
    no join, no window, no UDF.  bigram_lm_score: vocab passes happen
    at build time; the returned scoring plan is a pure per-row fold
    against the literal bigram map — 0 exchanges, join/UDF free.
    curriculum_order: ONE exchange hash-partitioned on (stage, shard)
    — sharding inside each stage is the skew guard; a bare PARTITION BY
    stage (3 giant sorts at 100 TB) must never come back.
    tfidf_topterms: the per-doc top-k must ride WindowGroupLimit with a
    PARTIAL (map-side) pass — no doc's full term list crosses the
    shuffle — and nothing evaluates Python."""
    from rxtls_spark.plans.checks import (
        count_exchanges,
        plan_string,
        shuffle_join_kinds,
    )
    from rxtls_spark.queries_training import (
        q_bigram_lm_score,
        q_curriculum_order,
        q_filter_cascade,
        q_tfidf_topterms,
    )

    fc = q_filter_cascade(spark, SF_SMOKE)
    p = plan_string(fc, "simple")
    assert count_exchanges(fc) == 0, p
    assert "Join" not in p and "Window" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p

    bi = q_bigram_lm_score(spark, SF_SMOKE)
    p = plan_string(bi, "simple")
    assert count_exchanges(bi) == 0, p
    assert "Join" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p

    cur = q_curriculum_order(spark, SF_SMOKE)
    p = plan_string(cur, "simple")
    assert count_exchanges(cur) == 1, p
    assert "hashpartitioning(stage" in p, p
    assert "rangepartitioning" not in plan_string(cur, "formatted").lower(), p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p
    assert shuffle_join_kinds(cur) == [], p

    tf = q_tfidf_topterms(spark, SF_SMOKE)
    p = plan_string(tf, "simple")
    assert p.count("WindowGroupLimit") == 2 and "Partial" in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_source_funnel_and_novelty_plan_shapes(spark):
    """source_funnel: the cascade stays a pure projection feeding ONE
    corpus agg; per-source totals join back as an explicit broadcast —
    never a shuffled join of the funnel table; no Python anywhere.
    ngram_novelty: gram-keyed shuffles are expected (the span_dedup
    class) but nothing may cross-join or evaluate Python."""
    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.queries_training import (
        q_ngram_novelty,
        q_source_funnel,
    )
    from tests.conftest import SF_SMOKE

    sf = q_source_funnel(spark, SF_SMOKE)
    p = plan_string(sf, "simple")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p

    nv = q_ngram_novelty(spark, SF_SMOKE)
    p = plan_string(nv, "simple")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p


def test_session5_query_plan_shapes(spark):
    """Session-5 scale locks.  zipf_alpha / postings_size: windows are
    hash-partitioned (source / term) — never a global range sort — the
    vocab filter is a literal IN (no join), and nothing evaluates
    Python.  temperature_mix: the scalar totals ride a broadcast
    (1-row crossJoin), no shuffled join, no window.  rel_event_funnel:
    join-FREE — the chained stage windows and the per-session agg
    reuse the session window's user_id hash partitioning.
    rel_hourly_anomalies: ONE corpus-scale agg; the median/MAD windows
    are per-type hash partitions, no global sort, no join."""
    from rxtls_spark.plans.checks import plan_string, shuffle_join_kinds
    from rxtls_spark.queries_relational import (
        q_event_funnel,
        q_hourly_anomalies,
    )
    from rxtls_spark.queries_training import (
        q_postings_size,
        q_temperature_mix,
        q_zipf_alpha,
    )
    from tests.conftest import SF_SMOKE

    za = q_zipf_alpha(spark, SF_SMOKE)
    p = plan_string(za, "simple")
    assert "Join" not in p, p  # vocab/topk all window+agg, no join node
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p
    assert "rangepartitioning" not in plan_string(za, "formatted").lower(), p

    ps = q_postings_size(spark, SF_SMOKE)
    p = plan_string(ps, "simple")
    assert "Join" not in p, p  # top-k vocab is a literal IN filter
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p
    assert "rangepartitioning" not in plan_string(ps, "formatted").lower(), p

    tm = q_temperature_mix(spark, SF_SMOKE)
    p = plan_string(tm, "simple")
    assert "BroadcastNestedLoopJoin" in p, p  # the 1-row scalar join
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p, p
    assert "Window" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p

    fu = q_event_funnel(spark, SF_SMOKE)
    p = plan_string(fu, "simple")
    assert "Join" not in p, p  # chained windows, not stage self-joins
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p

    ha = q_hourly_anomalies(spark, SF_SMOKE)
    p = plan_string(ha, "simple")
    assert "Join" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p
    assert "rangepartitioning" not in plan_string(ha, "formatted").lower(), p


def test_blocklist_and_entropy_are_map_only(spark):
    """blocklist_filter / char_entropy scale locks: pure per-row JVM
    expressions — zero exchanges, no join, no window, no Python."""
    from rxtls_spark.plans.checks import count_exchanges, plan_string
    from rxtls_spark.queries_training import q_blocklist_filter, q_char_entropy
    from tests.conftest import SF_SMOKE

    for q in (q_blocklist_filter, q_char_entropy):
        df = q(spark, SF_SMOKE)
        p = plan_string(df, "simple")
        assert count_exchanges(df) == 0, p
        assert "Join" not in p, p
        assert "Window" not in p, p
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p


def test_soft_dedup_plan_shape(spark):
    """soft_dedup scale lock: ONE whole-partition window over the md5
    hash — no join-back pass, no global sort, nothing evaluates
    Python.  The weight arithmetic must stay a pure map over the
    window output."""
    from rxtls_spark.plans.checks import count_exchanges, plan_string
    from rxtls_spark.queries_training import q_soft_dedup
    from tests.conftest import SF_SMOKE

    sd = q_soft_dedup(spark, SF_SMOKE)
    p = plan_string(sd, "simple")
    assert "Join" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p
    f = plan_string(sd, "formatted").lower()
    assert "rangepartitioning" not in f, f
    assert count_exchanges(sd) == 1, f


def test_rho_loss_select_plan_shape(spark):
    """rho_loss_select scale lock: both vocabs ride as literal maps
    (no join node anywhere), scoring is a pure map, and the top-k is
    TakeOrderedAndProject — never a global sort."""
    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.queries_training import q_rho_loss_select
    from tests.conftest import SF_SMOKE

    rl = q_rho_loss_select(spark, SF_SMOKE)
    p = plan_string(rl, "simple")
    assert "TakeOrderedAndProject" in p, p
    assert "Join" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p
    assert "Window" not in p, p


def test_packing_efficiency_plan_shape(spark):
    """packing_efficiency scale lock: a pure map + literal-grid
    explode into ONE partial-agg exchange — no window, no join,
    nothing evaluates Python."""
    from rxtls_spark.plans.checks import count_exchanges, plan_string
    from rxtls_spark.queries_training import q_packing_efficiency
    from tests.conftest import SF_SMOKE

    pe = q_packing_efficiency(spark, SF_SMOKE)
    p = plan_string(pe, "simple")
    assert "Join" not in p, p
    assert "Window" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p
    assert count_exchanges(pe) == 1, p
