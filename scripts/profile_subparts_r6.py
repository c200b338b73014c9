#!/usr/bin/env python
"""Attribute wall-clock inside the expensive dedup/text/similarity bench
queries (guide §1.1 empirical loop): each cumulative prefix of a query's
plan is forced with the noop sink (min of N reps), so consecutive deltas
attribute the cost to one sub-operator. Run on an otherwise idle box.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bgp_feature_extractor_spark.session import get_spark


def force(df):
    df.write.format("noop").mode("overwrite").save()


def tmin(fn, reps=3):
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        force(fn())
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="profile_subparts", master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )
    import __spark_entry__ as E
    from bgp_feature_extractor_spark.functions import text as TX
    from bgp_feature_extractor_spark.operators import dedup as DD
    from bgp_feature_extractor_spark.operators import similarity as SIM

    out = {}

    docs = E._t(spark, sf_dir, "documents")
    out["docs_scan"] = tmin(lambda: docs)

    # tokenization (HOF transform + md5/conv per word)
    toks = E._word_tokens_docs(spark, sf_dir)
    out["word_hash_tokens"] = tmin(lambda: toks)

    # minhash_lsh sub-parts
    sig = toks.select(
        F.col("doc_id").alias("_id"),
        DD.minhash_signature(F.array_distinct(F.col("tokens")), 32, 42).alias("sig"),
    ).filter(F.size(F.col("tokens")) > 0)
    out["minhash_sig32"] = tmin(lambda: sig)
    out["minhash_lsh_full"] = tmin(lambda: DD._banded_candidates(sig, 32, 4))

    # ngram_jaccard sub-parts
    d3 = toks.filter(F.size("tokens") >= 3)
    shingled = d3.select(
        "source", "lang", F.col("doc_id").alias("_id"),
        F.array_distinct(DD.ngram_shingles(F.col("tokens"), 3)).alias("sh"),
    )
    out["ngram_shingles"] = tmin(lambda: shingled)
    a, b = shingled.alias("a"), shingled.alias("b")
    pairs = (
        a.join(b, ["source", "lang"]).filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
    )
    out["ngram_pairs_nojac"] = tmin(lambda: pairs)
    out["ngram_jaccard_full"] = tmin(
        lambda: DD.ngram_jaccard_pairs(d3, "doc_id", "tokens", ["source", "lang"], 3, 0.2)
    )
    out["ngram_pairs_count"] = pairs.count()

    # ngram_jaccard_lsh sub-parts
    shk = toks.select(
        F.col("doc_id").alias("_id"),
        F.array_distinct(DD.ngram_shingle_keys(F.col("tokens"), 3)).alias("shk"),
    ).filter(F.size(F.col("tokens")) > 0)
    out["ngram_shingle_keys"] = tmin(lambda: shk)
    sig2 = shk.select("_id", DD.minhash_signature(F.col("shk"), 32, 42).alias("sig"))
    out["njl_sig"] = tmin(lambda: sig2)
    cands = DD._banded_candidates(sig2, 32, 4)
    out["njl_cands"] = tmin(lambda: cands)
    out["njl_full"] = tmin(lambda: E.q_ngram_jaccard_lsh(spark, sf_dir))
    out["njl_cands_count"] = cands.count()

    # text_stats sub-parts: each expression alone over the scan
    t = F.col("text")
    for nm, col in [
        ("tx_token_count", TX.token_count(t)),
        ("tx_subtoken", TX.subtoken_count(t)),
        ("tx_stopword", TX.stopword_ratio(t)),
        ("tx_punct", TX.punct_ratio(t)),
        ("tx_quality", TX.quality_score(t)),
        ("tx_lang", TX.lang_guess(t)),
        ("tx_fingerprint", TX.fingerprint(t)),
    ]:
        out[nm] = tmin(lambda c=col: docs.select("doc_id", c.alias("v")))
    out["text_stats_full"] = tmin(lambda: E.q_text_stats(spark, sf_dir))

    # corpus_prep funnel
    out["corpus_prep_full"] = tmin(lambda: E.q_corpus_prep(spark, sf_dir))

    # embeddings / ANN
    emb = E._t(spark, sf_dir, "embeddings")
    ec = F.col("embedding").cast("array<double>")
    out["hyperplane_sig"] = tmin(
        lambda: emb.select("vec_id", SIM.hyperplane_signature(ec, 8).alias("b"))
    )
    out["embedding_near_dup_full"] = tmin(lambda: E.q_embedding_near_dup(spark, sf_dir))
    out["ann_lsh_full"] = tmin(lambda: E.q_ann_lsh(spark, sf_dir))

    import tempfile, shutil
    tmp = tempfile.mkdtemp(prefix="r6_annprof_")
    try:
        t0 = time.perf_counter()
        SIM.write_ann_index(emb, f"{tmp}/lsh", n_planes=8)
        out["ann_lsh_build_write"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        SIM.write_ivf_index(emb, f"{tmp}/ivf", n_centroids=8, refine=True)
        out["ann_ivf_build_write"] = round(time.perf_counter() - t0, 3)
        import subprocess
        nf = subprocess.run(["bash", "-c", f"find {tmp}/lsh -name '*.parquet' | wc -l"],
                            capture_output=True, text=True).stdout.strip()
        out["ann_lsh_index_files"] = int(nf)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    out["loadavg"] = os.getloadavg()[0]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
