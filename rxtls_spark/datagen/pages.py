"""Synthesise the `pages` input table from the driver's `documents`.

``pages(url string, warc_ts timestamp, html binary, text string,
lang string)`` — exactly the BASELINE.json input_hint shape.  Every
field is a deterministic pure function of ``doc_id`` (rxtls_spark.spec)
so the DuckDB oracle recomputes aggregates independently from
``documents``.  Generation runs as ``mapInPandas`` (Arrow-batched; the
per-row framing encode is test-harness code, not the benchmarked hot
path — bench.py materialises pages to parquet once and times the
pipeline from the parquet scan, like the real 100 TB job would scan
Iceberg).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from rxtls_spark import spec

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)


def _gen_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        doc_ids = pdf["doc_id"].astype("int64")
        texts = pdf["text"].fillna("")
        out = pd.DataFrame(
            {
                "url": [spec.url(i) for i in doc_ids],
                "warc_ts": pd.to_datetime(
                    [spec.warc_epoch_s(i) for i in doc_ids], unit="s"
                ),
                "html": [
                    spec.html_bytes(i, t) for i, t in zip(doc_ids, texts)
                ],
                "text": texts.astype(str),
                "lang": pdf["lang"].astype(str),
            }
        )
        yield out


def pages_from_documents(
    documents: DataFrame, amplify: int = 1, gen_partitions: int | None = None
) -> DataFrame:
    """documents → pages; ``amplify`` replicates each document into
    ``amplify`` pages with fresh contiguous doc_ids (doc_id*amplify+rep)
    so all spec formulas stay valid — the small driver parquet stands in
    for a 10^12-row table at whatever scale the bench needs.  The
    explode happens JVM-side; a repartition fans the generation out
    (the source parquet is a single tiny split, which would otherwise
    serialize generation on one task)."""
    from pyspark.sql import functions as F

    docs = documents.select("doc_id", "text", "lang")
    if amplify > 1:
        docs = docs.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(amplify - 1)))
        ).select(
            (F.col("doc_id") * amplify + F.col("rep")).alias("doc_id"),
            "text",
            "lang",
        )
    if gen_partitions:
        docs = docs.repartition(gen_partitions)
    return docs.mapInPandas(_gen_batches, schema=PAGES_SCHEMA)


def pages_df(
    spark: SparkSession, sf_dir: str, amplify: int = 1,
    gen_partitions: int | None = None,
) -> DataFrame:
    """pages table for one scale-factor directory."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pages_from_documents(docs, amplify=amplify, gen_partitions=gen_partitions)
