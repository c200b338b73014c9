"""Focused equivalence tests for the round-6 optimization rewrites:
each one asserts the optimized path is value-identical to the reference
shape it replaced (the bench must get faster, never different)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bgp_feature_extractor_spark.operators import dedup as DD


def _docs(spark):
    """Tiny corpus with real duplicate multiplicity (the hot-group case the
    signature collapse targets): 12 distinct token streams x 4 copies."""
    rows = []
    did = 0
    for base in range(12):
        toks = [((base * 131 + i * 7919) % 997) for i in range(30 + base)]
        for _ in range(4):
            rows.append((did, toks))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, tokens array<long>")


def test_banded_candidates_collapse_equivalence(spark):
    """collapse=True (identical-signature grouping + expansion) must emit
    exactly the same pair set as the plain band join + distinct."""
    d = _docs(spark)
    plain = DD.minhash_lsh_pairs(
        d, "doc_id", "tokens", n_hashes=16, bands=4, collapse=False
    )
    collapsed = DD.minhash_lsh_pairs(
        d, "doc_id", "tokens", n_hashes=16, bands=4, collapse=True
    )
    p = {(r["id_a"], r["id_b"]) for r in plain.collect()}
    c_rows = collapsed.collect()
    c = {(r["id_a"], r["id_b"]) for r in c_rows}
    assert p == c
    # the collapsed plan must emit each pair exactly once (no distinct)
    assert len(c_rows) == len(c)
    # duplicates exist in the fixture, so within-group pairs are exercised
    assert len(c) >= 12 * 6  # each 4-copy group contributes C(4,2)=6 pairs


def test_ngram_jaccard_union_arithmetic(spark):
    """|A∪B| = |A|+|B|-|A∩B| must reproduce array_union sizes (and the
    jaccard doubles) for distinct shingle sets."""
    d = spark.createDataFrame(
        [(i, "g", [j % 13 for j in range(i, i + 9)]) for i in range(8)],
        "doc_id long, grp string, tokens array<long>",
    )
    out = DD.ngram_jaccard_pairs(d, "doc_id", "tokens", ["grp"], n=3, threshold=0.01)
    sh = d.select(
        "grp",
        F.col("doc_id").alias("_id"),
        F.array_distinct(DD.ngram_shingles(F.col("tokens"), 3)).alias("sh"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    ref = (
        a.join(b, ["grp"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            (
                F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
                / F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.01)
    )
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    want = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ref.collect()}
    assert got == want  # exact double equality, not approx


def test_with_bin_carried_anchor_fast_path(spark):
    """with_bin over a frame that already carries first_ts (the multi-width
    persisted-cache shape) must equal the joined path bin-for-bin."""
    from bgp_feature_extractor_spark.config import EngineConfig
    from bgp_feature_extractor_spark.operators.binning import (
        first_ts_per_source,
        with_bin,
    )

    ev = spark.createDataFrame(
        [("s%d" % (i % 3), i * 37, i) for i in range(200)],
        "source string, ts long, seq long",
    )
    cfg = EngineConfig(minutes_window=5)
    firsts = first_ts_per_source(ev)
    joined_path = with_bin(ev, firsts, cfg).select("source", "seq", "bin")
    carried = ev.join(firsts.select("source", "first_ts"), "source")
    fast_path = with_bin(carried, firsts, cfg).select("source", "seq", "bin")
    assert "first_ts" not in fast_path.columns
    got = sorted(map(tuple, fast_path.collect()))
    want = sorted(map(tuple, joined_path.collect()))
    assert got == want


def test_multi_width_exploded_equals_per_width_loop(spark):
    """The widths-as-data matrix must be row-identical to six independent
    single-width feature_matrix runs stacked with a width column."""
    import dataclasses

    from bgp_feature_extractor_spark.config import EngineConfig, golden_columns
    from bgp_feature_extractor_spark.plans.feature_matrix import (
        feature_matrix,
        multi_width_matrices,
    )
    from bgp_feature_extractor_spark.sources.synth import synth_events

    ev = synth_events(spark, 4000, n_sources=4, ts_scale=10)
    cfg = EngineConfig(minutes_window=1)
    widths = (1, 5, 15)
    caches: list = []
    got = multi_width_matrices(ev, None, cfg, widths=widths, caches=caches).drop(
        "timestamp"
    )
    ref = None
    for w in widths:
        wcfg = dataclasses.replace(cfg, minutes_window=w)
        m = feature_matrix(ev, None, wcfg).select(
            F.lit(int(w)).alias("minutes_window"), "source", "bin", *golden_columns(wcfg)
        ).drop("timestamp")
        ref = m if ref is None else ref.unionByName(m)
    cols = got.columns
    assert sorted(cols) == sorted(ref.columns)
    g = sorted(map(tuple, got.select(*cols).collect()))
    r = sorted(map(tuple, ref.select(*cols).collect()))
    assert g == r
    for c in caches:
        c.unpersist()
