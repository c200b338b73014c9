"""Rare-token (rare-AS) statistics — quirk Q5 (bgpmetrics_as.py:601-628).

Reference semantics are sequential-global per run: a frequency table over
all tokens seen so far, a threshold re-percentiled (P20) every 1000 paths,
post-increment rarity compare, and a 1000-path warm-up gate.

Engine modes:
  * 'exact'  — applyInPandas per source: each source is one reference run
    (the reference parallelized across peers with shell '&'; we parallelize
    across sources the same way, but inside one job). Faithful to the last
    integer. Limitation at extreme scale: one source's path stream visits a
    single task — the documented trade for bit-exactness; use 'block' when
    a single source exceeds task memory.
  * 'block'  — threshold frozen per 1000-path block computed from running
    per-block partial frequency merges (relaxed; documented in SURVEY §2.6
    A9). Implemented in M7 hardening round.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from bgp_feature_extractor_spark.config import EngineConfig


def _rare_kernel(cfg: EngineConfig):
    block = cfg.rare_block
    pct = cfg.rare_pctile

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "seq"], kind="stable").reset_index(drop=True)
        n = len(pdf)
        rare_ct = np.zeros(n, dtype=np.int32)
        gated = np.zeros(n, dtype=bool)
        freq: dict[int, int] = {}
        threshold = 0.0
        iteration = 1  # bgpmetrics_as.py:240 (rare_ases_iteration = 1)
        kinds = pdf["kind"].to_numpy()
        toks = pdf["tokens"].to_numpy(dtype=object)
        for i in range(n):
            if kinds[i] != "ann" or toks[i] is None:
                continue
            rare = 0
            for tok in set(toks[i]):
                f = freq.get(tok, 0) + 1
                freq[tok] = f
                if f < threshold:
                    rare += 1
            iteration += 1
            if iteration % block == 0:
                threshold = float(np.percentile(np.fromiter(freq.values(), dtype=np.int64), pct))
            if iteration > block:
                rare_ct[i] = rare
                gated[i] = True
        pdf["rare_ct"] = rare_ct
        pdf["rare_gated"] = gated
        return pdf

    return kernel


def rare_stage(classified: DataFrame, cfg: EngineConfig | None = None) -> DataFrame:
    """Adds per-event ``rare_ct`` / ``rare_gated`` columns."""
    cfg = cfg or EngineConfig()
    if cfg.rare_mode != "exact":
        raise NotImplementedError("rare_mode='block' lands in the hardening milestone")
    schema = T.StructType(
        classified.schema.fields
        + [
            T.StructField("rare_ct", T.IntegerType(), False),
            T.StructField("rare_gated", T.BooleanType(), False),
        ]
    )
    return classified.groupBy("source").applyInPandas(_rare_kernel(cfg), schema)
