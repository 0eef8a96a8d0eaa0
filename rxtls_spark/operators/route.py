"""Route-key derivation + salted repartitioning (SURVEY §4.2).

The reference shards work by ``xxh3(logURL) % numWorkers`` with stable
key→worker affinity (/root/reference/internal/core/scheduler.go:249-253)
and has NO skew mitigation beyond retry-failover.  Here the same
placement is an explicit hash exchange, plus real skew handling: the
synthetic pages table gives 3 hot hosts 15/10/7% of all rows (Zipf-ish,
FIXTURES.md §1), so a plain repartition(host) would put 15% of 100 TB
in one task.  ``salted_repartition`` splits each key into
``salt_buckets`` sub-keys — deterministic per url (no rand(): resume
and retry stay idempotent) — and AQE's skew-join/coalesce handles the
residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def route_key(lang_col: str = "lang", group_col: str = "suffix_group"):
    """route = lang|suffix_group — the per-sink fan-out key, analog of
    the per-log sink map (domain_extractor.go:618-629)."""
    return F.concat_ws("|", F.col(lang_col), F.col(group_col))


def salted_repartition(df: DataFrame, key_col: str, num_partitions: int,
                       salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Hash-exchange on (key, salt) where salt = xxhash64(url) % buckets.

    Spark's builtin ``xxhash64`` (XXH64 over row encoding) is fine here:
    only the *distribution* matters, not byte-equality (SURVEY §2.8
    F16).  Deterministic per row → rerunning a failed stage reproduces
    identical placement.
    """
    salt = F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets))
    return df.withColumn("_salt", salt).repartition(
        num_partitions, F.col(key_col), F.col("_salt")
    ).drop("_salt")


def salted_repartition_by_range(
    df: DataFrame,
    key_col: str,
    num_partitions: int,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """``repartitionByRange`` on (url-hash, salted key) — the north
    rule's stated layout, same placement semantics as the hash variant.

    Range partitioning samples (hash, key, salt) and assigns contiguous
    hash ranges to partitions: url-hash is uniform, so ranges are
    balanced even when ``key_col`` is 15%-hot, and the trailing
    (key, salt) columns keep same-key runs adjacent WITHIN a range for
    better sort locality at the sink.  Deterministic per row (no
    rand()) → retries reproduce placement, like ``salted_repartition``.
    """
    url_hash = F.xxhash64(F.col("url"))
    salt = F.pmod(F.xxhash64(F.col("url"), F.lit(1)), F.lit(salt_buckets))
    return (
        df.withColumn("_uh", url_hash)
        .withColumn("_salt", salt)
        .repartitionByRange(num_partitions, F.col("_uh"), F.col(key_col), F.col("_salt"))
        .drop("_uh", "_salt")
    )


def host_of_url(url_col: str = "url"):
    """hostname of https://host/path — JVM-side (F15 analog,
    models.go:67-72 Host() splits on '/')."""
    return F.split(F.regexp_replace(F.col(url_col), r"^https?://", ""), "/")[0]
