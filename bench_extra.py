#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1.4) — bench.py is FROZEN
for measurement; this file carries the noop-sink isolation runs, repeated
per-query timings, and explain("formatted") plan dumps cited in
OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py                       # all bench queries, 3 reps each
  python bench_extra.py minhash_lsh simhash   # just those, 3 reps
  python bench_extra.py --reps 5 corpus_prep
  python bench_extra.py --explain plans/r06 --suffix before minhash_lsh
  python bench_extra.py --headline            # feature_matrix_synth[_dense]

Methodology matches bench.py: same session factory, same sf dir/core count
envs, noop sink forces the full plan, clearCache between reps so each rep
pays its own cache population. Reports every rep + min/median per query as
ONE JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 3
    explain_dir = None
    suffix = "plan"
    headline = False
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--explain":
            explain_dir = args[i + 1]; i += 2
        elif a == "--suffix":
            suffix = args[i + 1]; i += 2
        elif a == "--headline":
            headline = True; i += 1
        else:
            names.append(a); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from bgp_feature_extractor_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if headline:
        from bgp_feature_extractor_spark.config import EngineConfig
        from bgp_feature_extractor_spark.plans.feature_matrix import feature_matrix

        cache_dir = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/root/repo/.bench-cache")
        n_rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "1000000"))
        cfg = EngineConfig(minutes_window=1)
        for nm, path in (
            ("feature_matrix_synth", f"{cache_dir}/bench_events_{n_rows}.parquet"),
            (
                "feature_matrix_synth_dense",
                f"{cache_dir}/bench_events_{n_rows}_hot5_s128_t100.parquet",
            ),
        ):
            ev = spark.read.parquet(path)
            qs[nm] = (lambda e: lambda _s, _d: feature_matrix(e, None, cfg))(ev)
        names = names or ["feature_matrix_synth", "feature_matrix_synth_dense"]

    if not names:
        import bench as benchmod

        names = list(benchmod.BENCH_QUERIES)

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        samples = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "samples": samples,
            "min": min(samples),
            "median": round(statistics.median(samples), 3),
        }
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"{explain_dir}/{name}_{suffix}.txt", "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
        print(json.dumps({name: out[name]}), file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "bench_extra_per_query",
                "reps": reps,
                "queries": out,
                "sf": sf_dir,
                "cpus": int(cpus),
                "loadavg": os.getloadavg()[0],
            }
        )
    )


if __name__ == "__main__":
    main()
