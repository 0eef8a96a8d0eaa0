"""Routing/salting tests: deterministic salted placement, skew spread,
host extraction."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def pages(spark):
    from rxtls_spark.datagen.pages import pages_df

    return pages_df(spark, SF_SMOKE).cache()


def test_host_of_url(spark, pages):
    from rxtls_spark.operators.route import host_of_url

    rows = pages.select("url", host_of_url().alias("h")).limit(50).collect()
    for r in rows:
        assert r["url"].startswith(f"https://{r['h']}/"), r


def test_hot_hosts_are_skewed(spark, pages):
    """The synthetic table must actually exercise skew: top-3 hosts
    carry ~32% of rows (15+10+7, spec.host_idx)."""
    from rxtls_spark.operators.route import host_of_url

    counts = sorted(
        (
            r["n"]
            for r in pages.select(host_of_url().alias("h"))
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ),
        reverse=True,
    )
    total = sum(counts)
    assert 0.25 < sum(counts[:3]) / total < 0.40


def test_salted_repartition_spreads_hot_keys(spark, pages):
    """Without salt, one hot host pins ~15% of rows to one partition;
    with salt the max partition stays near uniform."""
    from rxtls_spark.operators.route import host_of_url, salted_repartition

    n_parts = 16
    with_host = pages.withColumn("host", host_of_url())
    plain = with_host.repartition(n_parts, F.col("host"))
    salted = salted_repartition(with_host, "host", n_parts, salt_buckets=16)

    def max_share(df):
        sizes = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        total = sum(r["n"] for r in sizes)
        return max(r["n"] for r in sizes) / total

    assert max_share(salted) < max_share(plain)
    assert max_share(salted) < 2.5 / n_parts  # near-uniform


def test_salted_repartition_deterministic(spark, pages):
    from rxtls_spark.operators.route import salted_repartition

    df = salted_repartition(pages, "lang", 8)
    a = df.withColumn("pid", F.spark_partition_id()).select("url", "pid")
    b = salted_repartition(pages, "lang", 8).withColumn(
        "pid", F.spark_partition_id()
    ).select("url", "pid")
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


def test_range_repartition_spreads_hot_keys(spark, pages):
    """repartitionByRange on (url-hash, host, salt): url-hash is
    uniform, so even the 15/10/7% hot hosts (FIXTURES §1) land within
    a tight bound of uniform partition sizes."""
    from rxtls_spark.operators.route import (
        host_of_url,
        salted_repartition_by_range,
    )

    n_parts = 16
    with_host = pages.withColumn("host", host_of_url())
    ranged = salted_repartition_by_range(with_host, "host", n_parts)

    sizes = [
        r["n"]
        for r in ranged.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    total = sum(sizes)
    assert total == pages.count()
    assert len(sizes) == n_parts
    # range sampling on a uniform hash: max task input well under 2x
    # uniform even though one host has 15% of all rows
    assert max(sizes) / total < 1.8 / n_parts, sizes


def test_range_repartition_deterministic(spark, pages):
    from rxtls_spark.operators.route import salted_repartition_by_range

    def placements(df):
        return sorted(
            map(str, df.withColumn("pid", F.spark_partition_id())
                .select("url", "pid").collect())
        )

    a = placements(salted_repartition_by_range(pages, "lang", 8))
    b = placements(salted_repartition_by_range(pages, "lang", 8))
    assert a == b


def test_suffix_group_expr_matches_split_form(spark):
    """The substring_index route expression (r6 optimization) must equal
    the original regex-split + slice/array_join form on adversarial
    domains: empty, 1-4+ labels, unknown suffixes, wildcards, embedded
    spaces (junk-gate passthroughs), consecutive/leading dots, and every
    catalog suffix at depth 1-3."""
    from pyspark.sql import functions as F

    from rxtls_spark.datagen.lookups import tld_suffixes_rows
    from rxtls_spark.operators.enrich import suffix_group_expr

    rows = tld_suffixes_rows()

    def split_form(tld_rows, domain_col="primary_domain"):
        pairs = []
        for s, g in tld_rows:
            pairs.append(F.lit(s))
            pairs.append(F.lit(g))
        m = F.create_map(*pairs)
        labels = F.split(F.col(domain_col), r"\.")
        cand3 = F.when(F.size(labels) >= 4, F.array_join(F.slice(labels, -3, 3), "."))
        cand2 = F.when(F.size(labels) >= 3, F.array_join(F.slice(labels, -2, 2), "."))
        cand1 = F.when(F.size(labels) >= 2, F.array_join(F.slice(labels, -1, 1), "."))
        return F.coalesce(
            F.try_element_at(m, cand3),
            F.try_element_at(m, cand2),
            F.try_element_at(m, cand1),
            F.lit("other"),
        )

    doms = [
        "", "com", "a.com", "b.a.com", "c.b.a.com", "d.c.b.a.com",
        "co.uk", "x.co.uk", "a.x.co.uk", "*.a.com", "*.co.uk", "a.*.com",
        "a..com", ".com", "..", "a.b c", "::1", "-a.com", "a-.b.com",
        "a.unknown", "x.y.z.unknown", "xyz", "a.b.co.jp", "b.ne.jp",
        "1.2.3.4", "ac.uk", "b.ac.uk", "c.b.ac.uk", "a.com.", "a .com",
    ] + [s for s, _ in rows] + [f"deep.x.{s}" for s, _ in rows]
    df = spark.createDataFrame([(d,) for d in doms], "primary_domain string")
    got = [r.g for r in df.withColumn("g", suffix_group_expr(rows)).collect()]
    want = [r.g for r in df.withColumn("g", split_form(rows)).collect()]
    assert got == want, list(zip(doms, got, want))
