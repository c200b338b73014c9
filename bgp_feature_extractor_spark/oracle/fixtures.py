"""Deterministic fixture generators (FIXTURES.md §1-4, seed=42 convention).

Shapes:
  * ``sequences``      — the BASELINE.json input_hint table
                         (doc_id, tokens:array<int32>, n_tok, source).
  * ``events_updates`` — flat event stream exercising every classification
                         leaf of the reference state machine
                         (SURVEY.md §2.5 C1-C13).
  * ``rib_snapshot``   — initial as-of state (bgpmetrics_as.py:310-334 analog).
  * ``anomaly_intervals`` — labeling windows (label_csv.py:53-61 analog).

Pure numpy/pandas; Spark DataFrames are created from these in tests via
``spark.createDataFrame`` so oracle and engine consume byte-identical input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

VOCAB = 10_000
MAX_TOKENS = 15


def _zipf_weights(n: int, a: float = 1.2) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** a
    return w / w.sum()


def _mutate_tokens(rng: np.random.Generator, tokens: list[int]) -> list[int]:
    """0-3 random edits (insert/delete/substitute) — keeps edit-distance and
    longer/shorter features non-trivial (FIXTURES.md §1)."""
    out = list(tokens)
    for _ in range(int(rng.integers(0, 4))):
        op = rng.integers(0, 3)
        tok = int(rng.zipf(1.5) % VOCAB)
        if op == 0 and len(out) < MAX_TOKENS:
            out.insert(int(rng.integers(0, len(out) + 1)), tok)
        elif op == 1 and len(out) > 1:
            out.pop(int(rng.integers(0, len(out))))
        else:
            out[int(rng.integers(0, len(out)))] = tok
    return out


def _fresh_tokens(rng: np.random.Generator) -> list[int]:
    ln = int(rng.integers(1, MAX_TOKENS + 1))
    return [int(t) for t in rng.zipf(1.5, size=ln) % VOCAB]


def _attrs_sig(rng: np.random.Generator, prev: dict | None) -> dict[str, str]:
    """NEXT_HOP/MED/COMMUNITY stand-ins; 5% carry an unknown-type key
    (quirk Q6 exerciser, bgpmetrics_as.py:677-722)."""
    if prev is not None and rng.random() < 0.6:
        sig = dict(prev)
    else:
        sig = {"NH": f"10.0.{int(rng.integers(0, 8))}.1"}
        if rng.random() < 0.5:
            sig["MED"] = str(int(rng.integers(0, 4)))
        if rng.random() < 0.3:
            sig["COMM"] = f"{int(rng.integers(0, 4))}:{int(rng.integers(0, 4))}"
    if rng.random() < 0.05:
        sig["_unk1"] = str(int(rng.integers(0, 100)))
    return sig


def make_events_updates(
    n_events: int = 5000,
    n_sources: int = 6,
    entities_per_source: int = 40,
    seed: int = 42,
    wd_share: float = 0.2,
    t0: int = 1_043_000_000,
) -> pd.DataFrame:
    """Markov-ish walk so every classification leaf occurs (FIXTURES.md §2)."""
    rng = np.random.default_rng(seed)
    src_w = _zipf_weights(n_sources)
    src_ids = rng.choice(n_sources, size=n_events, p=src_w)
    rows: list[dict] = []
    ts_per_src = {s: t0 + int(rng.integers(0, 30)) for s in range(n_sources)}
    seq_per_src = dict.fromkeys(range(n_sources), 0)
    # per-entity generator state: last tokens/origin/attrs actually emitted
    ent_state: dict[tuple[int, int], dict] = {}
    for s in src_ids:
        s = int(s)
        ent = int(rng.integers(0, entities_per_source))
        key = (s, ent)
        ts_per_src[s] += int(rng.integers(0, 5))
        seq_per_src[s] += 1
        st = ent_state.get(key)
        is_wd = rng.random() < wd_share
        row = {
            "source": f"src{s}",
            "doc_id": f"d{s}-{ent}",
            "ts": ts_per_src[s],
            "seq": seq_per_src[s],
        }
        if is_wd:
            row.update({"kind": "wd", "tokens": None, "origin": None, "attrs_sig": None})
        else:
            r = rng.random()
            if st is None or r < 0.15:
                tokens = _fresh_tokens(rng)
            elif r < 0.55:
                tokens = list(st["tokens"])  # same path -> dup/flap/imp_spath
            else:
                tokens = _mutate_tokens(rng, st["tokens"])
            if st is None or rng.random() < 0.1:
                origin = int(rng.integers(0, 3))
            else:
                origin = st["origin"]
            sig = _attrs_sig(rng, st["attrs_sig"] if st else None)
            row.update({"kind": "ann", "tokens": tokens, "origin": origin, "attrs_sig": sig})
            ent_state[key] = {"tokens": tokens, "origin": origin, "attrs_sig": sig}
        rows.append(row)
    return pd.DataFrame(rows)


def make_rib_snapshot(
    events: pd.DataFrame, coverage: float = 0.7, seed: int = 42
) -> pd.DataFrame:
    """Seed state for ~70% of entities (FIXTURES.md §3)."""
    rng = np.random.default_rng(seed + 1)
    ents = events[["source", "doc_id"]].drop_duplicates().reset_index(drop=True)
    keep = rng.random(len(ents)) < coverage
    ents = ents[keep].reset_index(drop=True)
    rows = []
    for _, r in ents.iterrows():
        rows.append(
            {
                "source": r["source"],
                "doc_id": r["doc_id"],
                "tokens": _fresh_tokens(rng),
                "origin": int(rng.integers(0, 3)),
                "attrs_sig": {"NH": f"10.0.{int(rng.integers(0, 8))}.1"},
            }
        )
    return pd.DataFrame(rows, columns=["source", "doc_id", "tokens", "origin", "attrs_sig"])


def make_sequences(
    n_rows: int = 2000, n_sources: int = 8, seed: int = 42
) -> pd.DataFrame:
    """BASELINE.json input_hint table: (doc_id, tokens, n_tok, source);
    Zipf(1.2) source share so at least one hot source (FIXTURES.md §1)."""
    rng = np.random.default_rng(seed)
    src_w = _zipf_weights(n_sources)
    src_ids = rng.choice(n_sources, size=n_rows, p=src_w)
    ent_tokens: dict[tuple[int, int], list[int]] = {}
    rows = []
    order = dict.fromkeys(range(n_sources), 0)
    for s in src_ids:
        s = int(s)
        ent = int(rng.integers(0, 50))
        key = (s, ent)
        prev = ent_tokens.get(key)
        tokens = _fresh_tokens(rng) if prev is None else _mutate_tokens(rng, prev)
        ent_tokens[key] = tokens
        order[s] += 1
        rows.append(
            {
                "doc_id": f"d{s}-{ent}",
                "tokens": tokens,
                "n_tok": len(tokens),
                "source": f"src{s}",
                "seq": order[s],  # explicit within-source order column
            }
        )
    return pd.DataFrame(rows)


def make_anomaly_intervals(events: pd.DataFrame, label: int = 1) -> pd.DataFrame:
    """One interval per source over the middle ~50% of its timeline
    (FIXTURES.md §4) so before/during/after groups are all non-empty."""
    rows = []
    for src, g in events.groupby("source"):
        lo, hi = int(g["ts"].min()), int(g["ts"].max())
        span = hi - lo
        rows.append(
            {
                "event": "fixture",
                "source": src,
                "start_ts": lo + span // 4,
                "end_ts": hi - span // 4,
                "label": label,
            }
        )
    return pd.DataFrame(rows)
