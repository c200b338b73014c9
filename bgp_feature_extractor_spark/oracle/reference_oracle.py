"""Python-3-faithful pandas port of the reference feature semantics.

This is the allclose target for the Spark engine (SURVEY.md §5.1). It
mirrors control flow of /root/reference/bgpmetrics_as.py on the flat event
schema (FIXTURES.md §2), including the quirk ledger Q1-Q9 (SURVEY.md §7.0):

  * Q1 floor-division pseudo-mean   (bgpmetrics_as.py:635-636)
  * Q2 unique-avg uses running max  (bgpmetrics_as.py:637)
  * Q3 unique edit-distance dict is a verbatim copy of the plain one
                                    (bgpmetrics_as.py:179-185)
  * Q4 first_ts = ts of first event (bgpmetrics_as.py:365-366)
  * Q5 sequential rare-AS threshold (bgpmetrics_as.py:601-628)
  * Q6 unknown attr types compare as "different" (bgpmetrics_as.py:677-722)
  * Q7 origin counts per message    (bgpmetrics_as.py:667-675)
  * Q8 computed-but-unexported features are omitted here
  * dense spine + zero fill         (bgpmetrics_as.py:776-819)

NOT a copy of the reference code: different language (Py3), different data
model (flat events vs mrtparse records), different structure; used only in
tests as the semantic ground truth.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd

from bgp_feature_extractor_spark.config import EngineConfig, golden_columns


def levenshtein(a, b) -> int:
    """Plain DP edit distance over token lists (bgpmetrics_as.py:77-102
    semantics: unit-cost insert/delete/substitute)."""
    a, b = list(a), list(b)
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[len(b)]


class _SourceRun:
    """One reference 'run' (one peer process analog) over a single source."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.lookup: dict[str, dict] = {}
        self.withdrawn: dict[str, bool] = {}
        self.first_ts: int | None = None
        self.bin = 0
        # per-bin accumulators
        self.c = defaultdict(lambda: defaultdict(int))  # counter family -> bin -> n
        self.upds_prefixes: dict[int, set] = defaultdict(set)
        self.num_paths = defaultdict(int)
        self.as_path_avg = defaultdict(int)
        self.unique_avg = defaultdict(int)
        self.ed_dict = defaultdict(lambda: defaultdict(int))  # dist -> bin -> n
        self.ed_vals: dict[int, list[int]] = defaultdict(list)
        self.rare_vals: dict[int, list[int]] = defaultdict(list)
        self.origin_cnt = defaultdict(lambda: defaultdict(int))  # code -> bin -> n
        # rare-token global state (Q5)
        self.rare_dist = defaultdict(int)
        self.rare_threshold = 0.0
        self.rare_iteration = 1
        self.max_bin = 0

    # --- attr comparison (bgpmetrics_as.py:677-722 semantics on flat attrs)
    def _sig_equal(self, key: str, val: str, old_sig: dict) -> bool | None:
        if key.startswith(self.cfg.unknown_attr_prefix):
            return None  # Q6: unknown type -> treated as different
        return (key in old_sig) and (old_sig[key] == val)

    def _classify_as_path(self, tokens: list[int]) -> None:
        b = self.bin
        path_len = len(tokens)
        unique = set(tokens)
        rare = 0
        for tok in unique:
            self.rare_dist[tok] += 1
            if self.rare_dist[tok] < self.rare_threshold:
                rare += 1
        self.rare_iteration += 1
        if self.rare_iteration % self.cfg.rare_block == 0:
            self.rare_threshold = float(
                np.percentile(np.fromiter(self.rare_dist.values(), dtype=np.int64), self.cfg.rare_pctile)
            )
        if self.rare_iteration > self.cfg.rare_block:
            self.rare_vals[b].append(rare)
            if rare > self.c["rare_ases_max"][b]:
                self.c["rare_ases_max"][b] = rare
            self.c["number_rare_ases"][b] += rare
        if path_len > self.c["as_path_max"][b]:
            self.c["as_path_max"][b] = path_len
        if len(unique) > self.c["unique_as_path_max"][b]:
            self.c["unique_as_path_max"][b] = len(unique)
        self.num_paths[b] += 1
        n = self.num_paths[b]
        self.as_path_avg[b] = (path_len * n + self.as_path_avg[b]) // n  # Q1
        self.unique_avg[b] = (len(unique) * n + self.c["unique_as_path_max"][b]) // n  # Q2

    def _calc_edit_distance(self, new: list[int], old: list[int]) -> None:
        b = self.bin
        dist = levenshtein(new, old)
        self.ed_dict[dist][b] += 1
        if dist > self.c["edit_distance_max"][b]:
            self.c["edit_distance_max"][b] = dist
        self.ed_vals[b].append(dist)

    def _store(self, doc: str, ev: dict) -> None:
        self.lookup[doc] = {
            "origin": ev["origin"],
            "tokens": list(ev["tokens"]),
            "sig": dict(ev["attrs_sig"] or {}),
        }

    def _diff_attrs(self, ev: dict, old: dict, count_origin_change: bool = True) -> tuple[bool, bool]:
        """Returns (any_diff, path_diff); increments origin_changes on mismatch
        (side effect inside is_equal, bgpmetrics_as.py:685-690)."""
        any_diff = False
        path_diff = False
        if ev["origin"] != old["origin"]:
            if count_origin_change:
                self.c["origin_changes"][self.bin] += 1
            any_diff = True
        if list(ev["tokens"]) != old["tokens"]:
            any_diff = True
            path_diff = True
        for k, v in (ev["attrs_sig"] or {}).items():
            eq = self._sig_equal(k, v, old["sig"])
            if not eq:  # None (unknown) or False -> different
                any_diff = True
        return any_diff, path_diff

    def process(self, ev: dict) -> None:
        if self.first_ts is None:
            self.first_ts = int(ev["ts"])  # Q4
        self.bin = (int(ev["ts"]) - self.first_ts) // self.cfg.bin_size
        b = self.bin
        self.max_bin = max(self.max_bin, b)
        doc = ev["doc_id"]
        if ev["kind"] == "wd":
            self.c["withdrawals"][b] += 1
            if self.withdrawn.get(doc, False):
                self.c["wd_dups"][b] += 1
            self.withdrawn[doc] = True
            return
        # announcement
        self.c["announcements"][b] += 1
        self.upds_prefixes[b].add(doc)
        if ev["origin"] is not None:  # Q7 per-message ORIGIN count
            self.origin_cnt[int(ev["origin"])][b] += 1
        old = self.lookup.get(doc)
        if old is not None and not self.withdrawn.get(doc, False):
            # re-announcement (bgpmetrics_as.py:430-484)
            n_attrs_old = 2 + len(old["sig"])
            n_attrs_new = 2 + len(ev["attrs_sig"] or {})
            imp_wd = n_attrs_old != n_attrs_new
            self._classify_as_path(ev["tokens"])
            self._calc_edit_distance(list(ev["tokens"]), old["tokens"])
            if len(ev["tokens"]) > len(old["tokens"]):
                self.c["ann_to_longer"][b] += 1
            elif len(ev["tokens"]) < len(old["tokens"]):
                self.c["ann_to_shorter"][b] += 1
            any_diff, path_diff = self._diff_attrs(ev, old)
            imp_wd = imp_wd or any_diff
            if imp_wd:
                self.c["imp_wd"][b] += 1
                if path_diff:
                    self.c["imp_wd_dpath"][b] += 1
                else:
                    self.c["imp_wd_spath"][b] += 1
            else:
                self.c["dups"][b] += 1
            self._store(doc, ev)
        elif not self.withdrawn.get(doc, False):
            # brand-new announcement (bgpmetrics_as.py:487-503)
            self.c["news"][b] += 1
            self._classify_as_path(ev["tokens"])
            self._store(doc, ev)
        elif old is not None:
            # NADA / flap (bgpmetrics_as.py:505-549)
            self.withdrawn[doc] = False
            any_diff, _ = self._diff_attrs(ev, old)
            self._classify_as_path(ev["tokens"])
            self._calc_edit_distance(list(ev["tokens"]), old["tokens"])
            if len(ev["tokens"]) > len(old["tokens"]):
                self.c["ann_to_longer"][b] += 1
            elif len(ev["tokens"]) < len(old["tokens"]):
                self.c["ann_to_shorter"][b] += 1
            if any_diff:
                self.c["nadas"][b] += 1
            else:
                self.c["flaps"][b] += 1
            self._store(doc, ev)
        else:
            # ann-after-wd-unknown: counted but never exported (C10/Q8);
            # withdrawn flag deliberately NOT cleared (bgpmetrics_as.py:551-566)
            self._classify_as_path(ev["tokens"])
            self._store(doc, ev)

    def matrix(self) -> pd.DataFrame:
        cfg = self.cfg
        bins = np.arange(self.max_bin + 1)
        out: dict[str, np.ndarray] = {"bin": bins}
        int_feats = [
            "announcements",
            "withdrawals",
            "wd_dups",
            "news",
            "dups",
            "flaps",
            "nadas",
            "imp_wd",
            "imp_wd_spath",
            "imp_wd_dpath",
            "ann_to_longer",
            "ann_to_shorter",
            "origin_changes",
            "as_path_max",
            "unique_as_path_max",
            "rare_ases_max",
            "number_rare_ases",
            "edit_distance_max",
        ]
        for f in int_feats:
            out[f] = np.array([self.c[f].get(b, 0) for b in bins], dtype=np.int64)
        out["nlri_ann"] = np.array([len(self.upds_prefixes.get(b, ())) for b in bins], dtype=np.int64)
        out["as_path_avg"] = np.array([self.as_path_avg.get(b, 0) for b in bins], dtype=np.int64)
        out["unique_as_path_avg"] = np.array([self.unique_avg.get(b, 0) for b in bins], dtype=np.int64)
        out["edit_distance_avg"] = np.array(
            [float(np.mean(self.ed_vals[b])) if self.ed_vals.get(b) else 0.0 for b in bins]
        )
        out["rare_ases_avg"] = np.array(
            [float(np.mean(self.rare_vals[b])) if self.rare_vals.get(b) else 0.0 for b in bins]
        )
        for k in range(cfg.pivot_limit):
            col = np.array([self.ed_dict[k].get(b, 0) for b in bins], dtype=np.int64)
            out[f"edit_distance_dict_{k}"] = col
            out[f"edit_distance_unique_dict_{k}"] = col  # Q3 verbatim copy
        for code in cfg.origin_values:
            out[f"origin_{code}"] = np.array([self.origin_cnt[code].get(b, 0) for b in bins], dtype=np.int64)
        out["timestamp2"] = (self.first_ts or 0) + bins * cfg.bin_size
        out["timestamp"] = pd.to_datetime(out["timestamp2"], unit="s")
        out["class"] = np.zeros(len(bins), dtype=np.int64)
        df = pd.DataFrame(out)
        return df[["bin"] + golden_columns(cfg)]


class ReferenceOracle:
    """Runs the reference semantics per source (one 'peer process' analog
    per source, matching scripts/slammer-features.sh parallelism model)."""

    def __init__(self, cfg: EngineConfig | None = None):
        self.cfg = cfg or EngineConfig()

    def run(
        self, events: pd.DataFrame, snapshot: pd.DataFrame | None = None
    ) -> pd.DataFrame:
        frames = []
        for src, g in events.groupby("source", sort=True):
            run = _SourceRun(self.cfg)
            if snapshot is not None:
                snap = snapshot[snapshot["source"] == src]
                for _, r in snap.iterrows():
                    run.lookup[r["doc_id"]] = {
                        "origin": int(r["origin"]),
                        "tokens": list(r["tokens"]),
                        "sig": dict(r["attrs_sig"] or {}),
                    }
            g = g.sort_values(["ts", "seq"], kind="stable")
            for ev in g.to_dict("records"):
                run.process(ev)
            m = run.matrix()
            m.insert(0, "source", src)
            frames.append(m)
        return pd.concat(frames, ignore_index=True)
