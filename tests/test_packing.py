"""LPT packing operator: planned placement is the physical placement,
and the packed rare stage is byte-identical to the unpacked one."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bgp_feature_extractor_spark.config import EngineConfig
from bgp_feature_extractor_spark.operators.binning import first_ts_per_source, with_bin
from bgp_feature_extractor_spark.operators.packing import (
    injective_partition_tokens,
    lpt_assign,
    repartition_packed,
)
from bgp_feature_extractor_spark.operators.rare import rare_bin_aggregates_stream

from tests.conftest import events_sdf


def test_lpt_assign_balances_skew():
    sizes = [("hot", 100), ("a", 10), ("b", 10), ("c", 10), ("d", 10)]
    assign = lpt_assign(sizes, 2)
    # hot alone on one slot; the four small keys share the other
    hot_slot = assign["hot"]
    assert all(assign[k] != hot_slot for k in "abcd")


def test_lpt_assign_deterministic_and_total():
    sizes = [(f"s{i}", 7 * i % 13 + 1) for i in range(40)]
    a1 = lpt_assign(sizes, 6)
    a2 = lpt_assign(list(reversed(sizes)), 6)
    assert a1 == a2
    assert set(a1.values()) <= set(range(6))


def test_injective_tokens_land_in_their_partition(spark):
    for n in (3, 8, 20):
        toks = injective_partition_tokens(spark, n)
        assert len(set(toks)) == n
        df = spark.createDataFrame([(x,) for x in toks], ["x"]).withColumn(
            "x", F.col("x").cast("int")
        )
        placed = (
            df.repartition(n, "x")
            .withColumn("pid", F.spark_partition_id())
            .collect()
        )
        got = {r["x"]: r["pid"] for r in placed}
        assert got == {toks[p]: p for p in range(n)}


def test_repartition_packed_matches_plan(spark):
    rows = []
    sizes = {f"k{i}": (i + 1) * 10 for i in range(7)}
    for k, n in sizes.items():
        rows += [(k, j) for j in range(n)]
    df = spark.createDataFrame(rows, ["key", "v"])
    packed = repartition_packed(df, "key", list(sizes.items()), n_parts=3)
    placed = (
        packed.withColumn("pid", F.spark_partition_id())
        .groupBy("key")
        .agg(F.count_distinct("pid").alias("npid"), F.first("pid").alias("pid"))
        .collect()
    )
    # each key wholly in one partition, matching the LPT plan
    plan = lpt_assign(list(sizes.items()), 3)
    toks = injective_partition_tokens(spark, 3)
    for r in placed:
        assert r["npid"] == 1
        assert r["pid"] == plan[r["key"]]
    assert toks  # tokens resolvable


@pytest.fixture()
def rare_events(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for s, weight in (("s_hot", 900), ("s_a", 220), ("s_b", 150), ("s_c", 40)):
        for i in range(weight):
            toks = np.unique(rng.integers(0, 50, size=rng.integers(1, 6))).tolist()
            rows.append((s, f"e{i % 17}", i, i, "ann", toks, 0, None))
    pdf = pd.DataFrame(
        rows,
        columns=["source", "doc_id", "ts", "seq", "kind", "tokens", "origin", "attrs_sig"],
    )
    return events_sdf(spark, pdf)


def test_rare_stream_packed_parity(spark, rare_events):
    cfg = EngineConfig(rare_block=100)
    firsts = first_ts_per_source(rare_events)
    binned = with_bin(rare_events, firsts, cfg)
    sizes = [
        (r["source"], int(r["n_rows"]))
        for r in firsts.select("source", "n_rows").collect()
    ]
    base = rare_bin_aggregates_stream(binned, cfg).orderBy("source", "bin").collect()
    packed = (
        rare_bin_aggregates_stream(binned, cfg, sizes=sizes)
        .orderBy("source", "bin")
        .collect()
    )
    assert [tuple(r) for r in base] == [tuple(r) for r in packed]
    assert len(base) > 0


def test_unmapped_keys_survive_and_stay_whole(spark):
    # ADVICE r2: keys missing from the caller's sizes list must not be
    # silently dropped — they fall back to a hash-consistent partition
    rows = [(k, i) for k in ("a", "b", "ghost") for i in range(10)]
    df = spark.createDataFrame(rows, ["source", "v"])
    out = repartition_packed(df, "source", [("a", 10), ("b", 10)], n_parts=2)
    placed = out.withColumn("pid", F.spark_partition_id()).collect()
    assert len(placed) == 30  # nothing dropped
    pids = {}
    for r in placed:
        pids.setdefault(r["source"], set()).add(r["pid"])
    # every key (mapped or not) lands wholly in one partition
    assert all(len(v) == 1 for v in pids.values())
