"""Deterministic Spark-native synthetic event generator for benchmarks.

Pure JVM expressions over ``spark.range`` — no Python in the generation
path, so a 10^6..10^9-row stream materializes at scan speed. Zipf-ish skew:
one hot source carries ~40% of rows (the north_rule's hot-AS analog), the
rest spread over ``n_sources - 1`` uniform sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_events(
    spark: SparkSession,
    n_rows: int = 1_000_000,
    n_sources: int = 20,
    entities_per_source: int = 5_000,
    vocab: int = 10_000,
    max_len: int = 15,
    wd_pct: int = 15,
    seed: int = 42,
    hot_pct: int = 40,
    ts_scale: int = 1,
    n_partitions: int | None = None,
) -> DataFrame:
    """hot_pct: share of rows carried by the single hot source (skew knob;
    40 = extreme hot-AS stress, 100//n_sources = uniform).

    ts_scale: events per second across the whole stream (ts = rid //
    ts_scale). The default 1 spreads one event per second — at 60s bins
    that is ~2 events per (source, bin), a degenerate rollup where output
    row count ~= bins x sources. Real BGP collectors see hundreds-to-
    thousands of updates per minute bin (the reference's slammer CSVs),
    so scale benchmarks use ts_scale >> 1 for honest aggregation density.

    n_partitions: generation parallelism, which becomes the written file
    count. Each range partition is a CONTIGUOUS rid (= seq/ts) slice, so
    the parquet delta encodings stay tight — a post-hoc round-robin
    repartition of the same rows measured 26% larger on disk. Pass ~64
    when writing a benchmark cache read at several core counts: a cache
    written at local[4] is 4 one-row-group files whose scan cannot
    parallelize past 4 tasks."""
    if n_partitions:
        df = spark.range(0, n_rows, numPartitions=n_partitions)
    else:
        df = spark.range(n_rows)
    df = df.withColumnRenamed("id", "rid")
    h = lambda salt: F.pmod(F.xxhash64("rid", F.lit(seed), F.lit(salt)), F.lit(1 << 31))  # noqa: E731
    source = F.when(h(0) % 100 < hot_pct, F.lit("src0")).otherwise(
        F.concat(F.lit("src"), (1 + h(1) % (n_sources - 1)).cast("string"))
    )
    is_wd = h(2) % 100 < wd_pct
    length = (1 + h(3) % max_len).cast("int")
    # entity-sticky base token keeps duplicate/imp-wd classes non-trivial
    ent = h(4) % entities_per_source
    tokens = F.transform(
        F.sequence(F.lit(1), length),
        lambda i: F.pmod(
            F.xxhash64(ent, i, F.pmod(h(5), F.lit(7)), F.lit(seed)), F.lit(vocab)
        ).cast("int"),
    )
    return df.select(
        source.alias("source"),
        F.concat(F.lit("e"), ent.cast("string")).alias("doc_id"),
        (F.col("rid") / F.lit(int(ts_scale))).cast("long").alias("ts"),
        F.col("rid").cast("long").alias("seq"),
        F.when(is_wd, F.lit("wd")).otherwise(F.lit("ann")).alias("kind"),
        F.when(~is_wd, tokens).alias("tokens"),
        F.when(~is_wd, (h(6) % 3).cast("int")).alias("origin"),
        F.when(
            ~is_wd, F.create_map(F.lit("NH"), (h(7) % 8).cast("string"))
        ).alias("attrs_sig"),
    )
