"""Byte-identical CSV line formatting (SURVEY §2.8 F6/F7).

Reproduces the reference's two CSV layouts as Catalyst expressions —
including the quirks the reference tests lock in (models_test.go:
125-128): naive quoting (no quote escaping) and the comma-joined
domains list inside an UNQUOTED field, so the output is deliberately
not RFC-4180.  FIXTURES.md §5.4 records the decision: these lines are
for equality checks against the reference format; real sinks are
parquet.

domains line (models.go:211-222):
  {idx},{normalized_cn},{primary_domain},{output_domains ','-joined},
  {C},"{ST}","{L}","{O}","{issuer_cn}",{domain_org_hash}

download line (models.go:181-191):
  {url},{idx},{chain_hash},{der_b64},{all_domains ' '-joined},
  {not_before},{not_after}
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def domains_csv_line(idx_col: str = "leaf_offset") -> Column:
    return F.format_string(
        '%d,%s,%s,%s,%s,"%s","%s","%s","%s",%s',
        F.col(idx_col),
        F.col("normalized_cn"),
        F.col("primary_domain"),
        F.array_join(F.col("output_domains"), ","),
        F.col("subject_c"),
        F.col("subject_st"),
        F.col("subject_l"),
        F.col("subject_o"),
        F.col("issuer_cn"),
        F.col("domain_org_hash"),
    )


def download_csv_line(url_col: str = "url", idx_col: str = "leaf_offset") -> Column:
    return F.format_string(
        "%s,%d,%s,%s,%s,%d,%d",
        F.col(url_col),
        F.col(idx_col),
        F.col("chain_hash"),
        F.base64(F.col("extracted_text")),  # DER-b64 analog: payload text
        F.array_join(F.col("all_domains"), " "),
        F.col("not_before"),
        F.col("not_after"),
    )


def write_csv_sink(df: DataFrame, path: str, gzip: bool = False,
                   partition_by: list[str] | None = None) -> None:
    """S6/S7: header'd CSV sink, optional gzip (the reference's
    BestSpeed gzip ≈ codec level is the writer's concern), one
    directory per route when partitioned."""
    w = df.write.mode("overwrite").option("header", True)
    if gzip:
        w = w.option("compression", "gzip")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)
