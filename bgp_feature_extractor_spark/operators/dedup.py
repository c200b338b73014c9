"""Deduplication operators for large-scale training-data pipelines.

All hash math is integer-deterministic and expressible in ANSI SQL so every
operator has a DuckDB oracle twin (driver correctness gate). The MinHash
family is the scale path: signatures are computed with JVM higher-order
array functions (no UDF), and the LSH band self-join turns the O(n²)
pairwise problem into an equi-join on (band, band_signature) — shuffle on
band keys, broadcast-free, skew-safe because band keys are hash-uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic affine hash family over a Mersenne prime; 2^31-1 keeps
# a*(x mod p) < 2^62 so the math never overflows int64 (and the identical
# expression is valid in the DuckDB oracle)
MERSENNE = (1 << 31) - 1


def _hash_params(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs — a simple LCG expansion of the seed so the
    DuckDB oracle can inline the same constants."""
    params = []
    x = seed
    for _ in range(n):
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        a = (x % (MERSENNE - 1)) + 1
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        b = x % MERSENNE
        params.append((a, b))
    return params


def dedup_exact(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: hash-group on content, keep the minimum id per group.
    One shuffle on the content hash; at 100TB prefer md5(content) as the
    group key (fixed 128-bit) over the raw content columns."""
    key = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]))
    return (
        df.withColumn("content_key", key)
        .groupBy("content_key")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_signature(tokens_col, n_hashes: int = 16, seed: int = 42):
    """Column expression: array<long> of n_hashes min-hashes over an
    array<long> token column. Pure JVM, and deliberately ONE ``aggregate``
    fold with an array accumulator (elementwise ``least`` against the
    per-hash affine values) instead of n_hashes separate
    transform+array_min trees: the single small expression stays inside
    whole-stage codegen, where the wide tree forced interpreted eval."""
    ab = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in _hash_params(n_hashes, seed)
        ]
    )
    init = F.array_repeat(F.lit(MERSENNE).cast("long"), n_hashes)
    return F.aggregate(
        tokens_col,
        init,
        lambda acc, x: F.zip_with(
            acc,
            ab,
            lambda m, p: F.least(
                m, (p["a"] * (x.cast("long") % MERSENNE) + p["b"]) % MERSENNE
            ),
        ),
    )


def _banded_candidates(
    sig: DataFrame,
    n_hashes: int,
    bands: int,
    caches: list | None = None,
    collapse: bool = True,
) -> DataFrame:
    """(_id, sig: array<long>) -> distinct candidate pairs (id_a < id_b):
    explode each signature into its bands, equi-join on (band, band key).

    Identical-signature collapse (guide §2.5, hot keys): exact-duplicate
    documents all share one full signature, so they form quadratic hot
    groups in EVERY band — at sf0.1 the naive band self-join emitted 5.6M
    collision rows that a 2.4s terminal distinct squeezed to 3.29M pairs.
    Instead, docs are grouped by signature (min-id representative via one
    window over the signature key), the band join runs over DISTINCT
    signatures only, and rep pairs are expanded back to id pairs, plus the
    all-pairs within each identical-signature group. The pair set is
    provably identical — same-sig pairs collide in all bands; cross-sig
    pairs collide iff their representatives do — and each pair is emitted
    exactly once, so no distinct over the expanded set is needed.
    (measured: minhash_lsh candidates 3.95s -> 0.93s at sf0.1.)

    The band self-join is repartitioned on its key first so both sides
    hang off one canonical exchange (ReusedExchange, guide §2.4) instead
    of a broadcast whose build side re-computes the signature subtree.

    ``caches``: when given, the (id, sig, rep) frame — read by three
    subtrees — is persisted and appended for caller-controlled unpersist;
    when None it is recomputed per subtree (correct, slower).

    ``collapse``: the collapse pays for itself when identical signatures
    have real multiplicity (raw corpora full of exact duplicates —
    measured 3.95s -> 0.93s on the duplicated sf0.1 documents). When the
    input is already exact-deduped (corpus_prep's post-md5 stage) the
    group machinery is ~6 extra stages of pure overhead — pass False to
    run the plain band self-join + distinct.
    """
    from pyspark.sql import Window

    rows_per_band = n_hashes // bands
    if not collapse:
        banded = sig.select(
            "_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band"),
                            F.concat_ws(
                                ",", *[F.col("sig")[i * rows_per_band + j].cast("string") for j in range(rows_per_band)]
                            ).alias("bkey"),
                        )
                        for i in range(bands)
                    ]
                )
            ).alias("bs"),
        ).select("_id", "bs.band", "bs.bkey")
        banded = banded.repartition("band", "bkey")
        a, b = banded.alias("a"), banded.alias("b")
        return (
            a.join(b, ["band", "bkey"])
            .filter(F.col("a._id") < F.col("b._id"))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .distinct()
        )
    mem = sig.select(
        "_id", "sig", F.min("_id").over(Window.partitionBy("sig")).alias("_rid")
    )
    if caches is not None:
        mem = mem.persist()
        caches.append(mem)
    reps = mem.filter(F.col("_id") == F.col("_rid")).select("_id", "sig")
    banded = reps.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.concat_ws(
                            ",", *[F.col("sig")[i * rows_per_band + j].cast("string") for j in range(rows_per_band)]
                        ).alias("bkey"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("_id", "bs.band", "bs.bkey")
    banded = banded.repartition("band", "bkey")
    a = banded.alias("a")
    b = banded.alias("b")
    rep_pairs = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("_ra"), F.col("b._id").alias("_rb"))
        .distinct()
    )
    ma = mem.select(F.col("_rid").alias("_ra"), F.col("_id").alias("_ia"))
    mb = mem.select(F.col("_rid").alias("_rb"), F.col("_id").alias("_ib"))
    cross = (
        rep_pairs.join(ma, "_ra")
        .join(mb, "_rb")
        .select(
            F.least("_ia", "_ib").alias("id_a"), F.greatest("_ia", "_ib").alias("id_b")
        )
    )
    within = (
        ma.join(mb.withColumnRenamed("_rb", "_ra"), "_ra")
        .filter(F.col("_ia") < F.col("_ib"))
        .select(F.col("_ia").alias("id_a"), F.col("_ib").alias("id_b"))
    )
    return cross.unionByName(within)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    seed: int = 42,
    caches: list | None = None,
    collapse: bool = True,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH.

    shingle->minhash->band->bucket-join: docs sharing any full band of the
    signature become a candidate pair (id_a < id_b, distinct).

    ``caches`` / ``collapse``: forwarded to _banded_candidates — pass a
    list to persist the signature frame (read by three subtrees) and
    receive it for caller-controlled unpersist; pass collapse=False when
    the input is already exact-deduped."""
    sig = df.select(
        F.col(id_col).alias("_id"),
        minhash_signature(F.array_distinct(F.col(tokens_col)), n_hashes, seed).alias("sig"),
    ).filter(F.size(F.col(tokens_col)) > 0)
    return _banded_candidates(sig, n_hashes, bands, caches=caches, collapse=collapse)


def ngram_shingles(tokens_col, n: int = 3):
    """array<string> of n-gram shingles, each a '-'-joined token run
    (JVM: sequence + slice + array_join; strings rather than nested arrays
    keep set ops engine-portable)."""
    return F.when(
        F.size(tokens_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens_col) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(tokens_col, i, n), "-"),
        ),
    ).otherwise(F.array(F.array_join(tokens_col, "-")))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    group_cols: list[str],
    n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Pairwise n-gram Jaccard within blocking groups. The blocking-group
    self-join bounds the quadratic blowup; at scale use minhash_lsh_pairs to
    produce candidates and this to verify them.

    Cost notes (measured at sf0.1): |A∪B| is computed ARITHMETICALLY as
    |A| + |B| - |A∩B| (exact for the array_distinct'ed inputs) instead of
    materializing the array_union of ~600 strings per pair just to take
    its size — that halves the per-pair set-op work. The self-join is
    repartitioned on the block key so both sides share one exchange
    (ReusedExchange) and the shingle computation runs once, not twice
    (guide §2.4). A co-occurrence (explode + count) rewrite was measured
    and REJECTED: Spark's InferFiltersFromGenerate pushes an inferred
    size/isnotnull filter below the explode, substituting the full
    shingle expression whose transform-lambda then re-tokenizes the
    document per element — 7.1s -> 18s."""
    shingled = df.select(
        *group_cols,
        F.col(id_col).alias("_id"),
        F.array_distinct(ngram_shingles(F.col(tokens_col), n)).alias("sh"),
    ).repartition(*group_cols)
    a, b = shingled.alias("a"), shingled.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size("a.sh") + F.size("b.sh") - inter
    return (
        a.join(b, group_cols)
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            (inter / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_shingle_keys(tokens_col, n: int = 3, base: int = 1_000_003):
    """array<long> of polynomial n-gram shingle keys over an int token
    column: key = fold(0, (acc, x) -> (acc*base + x%M) % M) over each
    length-n window (whole array for short docs, mirroring ngram_shingles).
    Integer-deterministic and expressible in DuckDB (list_reduce), so the
    LSH->Jaccard composition keeps an exact oracle twin. acc < M = 2^31 and
    base < 2^20 keep acc*base + x < 2^52 — no int64 overflow."""

    def key(slice_col):
        return F.aggregate(
            F.transform(slice_col, lambda x: x.cast("long") % MERSENNE),
            F.lit(0).cast("long"),
            lambda acc, x: (acc * base + x) % MERSENNE,
        )

    return F.when(
        F.size(tokens_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens_col) - F.lit(n - 1)),
            lambda i: key(F.slice(tokens_col, i, n)),
        ),
    ).otherwise(F.array(key(tokens_col)))


def ngram_jaccard_lsh_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    n: int = 3,
    threshold: float = 0.0,
    n_hashes: int = 32,
    bands: int = 4,
    seed: int = 42,
    caches: list | None = None,
) -> DataFrame:
    """The 100TB near-dup shape: banded-LSH candidates over the SHINGLE
    space, exact n-gram Jaccard computed ONLY on candidate pairs.

    vs ngram_jaccard_pairs (all-pairs within blocking groups, quadratic in
    the hottest block): here the expensive set intersection runs on
    O(candidates) rows, and candidates come from a hash-uniform band
    equi-join — every stage is linear-ish and skew-safe. Jaccard is over
    the deterministic shingle-key sets, so the verified similarity is the
    same quantity the MinHash signatures approximate."""
    shingled = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(ngram_shingle_keys(F.col(tokens_col), n)).alias("shk"),
    ).filter(F.size(F.col(tokens_col)) > 0)
    if caches is not None:
        # the shingle-key sets are read by three subtrees (signature build
        # + both verify sides) — persist so the shingling runs once
        shingled = shingled.persist()
        caches.append(shingled)
    sig = shingled.select("_id", minhash_signature(F.col("shk"), n_hashes, seed).alias("sig"))
    # collapse=False: the banded join here runs over the shingle-KEY space
    # where measured collision multiplicity is low — the identical-sig
    # group machinery costs more stages than the distinct it saves
    cands = _banded_candidates(sig, n_hashes, bands, caches=caches, collapse=False)
    sa = shingled.select(F.col("_id").alias("id_a"), F.col("shk").alias("sh_a"))
    sb = shingled.select(F.col("_id").alias("id_b"), F.col("shk").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(tokens_col, bits: int = 31, seed: int = 42):
    """SimHash over an array<long> token column, pure JVM: per-token affine
    hash, per-bit +-1 vote via aggregate, sign -> bit."""
    (a, b) = _hash_params(1, seed)[0]
    h = F.transform(
        tokens_col,
        lambda x: (F.lit(a) * (x.cast("long") % F.lit(MERSENNE)) + F.lit(b))
        % F.lit(MERSENNE),
    )
    # ONE fold carrying all per-bit votes as an array accumulator (the
    # `bits` separate aggregate trees of the naive form blow past codegen
    # limits and fall back to interpreted eval)
    powers = F.array(*[F.lit(1 << i).cast("long") for i in range(bits)])
    votes = F.aggregate(
        h,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, v: F.zip_with(
            acc,
            powers,
            lambda cnt, p: cnt
            + F.when(F.floor(v / p).cast("long") % 2 == 1, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(votes, powers, lambda cnt, p: F.when(cnt > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
