#!/usr/bin/env python
"""Compute the north-rule protocol headline from the tracked evidence.

Protocol (defined round 2, held to by the round-3 verdict): the headline
raw 4->16 scaling efficiency is

    min(sec@4) / (4 * min(sec@16))

over every exec-only dense-profile sample of the SAME job + input
(8M rows, hot_pct=5, n_sources=128, ts_scale=100, rare_mode auto/block)
across all rounds. Minima only improve with more samples, so the number
is a lower bound on the quiet-machine efficiency; per-sample load
columns keep contaminated samples identifiable but NOT excluded — the
protocol consumes the min, not a filtered mean.

Sources of 16c samples:
  * SCALING_RUNS_r{2,3,4}.jsonl interleaved-watch rows (all_sec@4 /
    all_sec@16 per row; rows tagged rare_mode "dist" or carrying
    "input_files" are excluded — different job or input layout);
  * SAMPLER_16C_r4.jsonl opportunistic single samples (same CHILD
    code path, same cached input, exec-only timing).

Prints one JSON line; run at round close to produce the BASELINE.md
headline so the document can never drift from the data again (the r2
and r3 verdicts each caught a stale hand-written headline).
"""
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DENSE = {"rows": 8000000, "hot_pct": 5, "n_sources": 128, "ts_scale": 100}


def series_row(r, medium="/tmp", rows=8000000):
    """Shared filter for every series: same job, same input layout, same
    shuffle medium. The input_files / dist exclusions apply to ALL media
    (r4 advice: the tmpfs and size series previously skipped them)."""
    if r.get("input_files"):  # excluded 64-file layout experiment
        return False
    if r.get("rare_mode") == "dist":  # different kernel, one-time row
        return False
    if r.get("advisory", "64m") != "64m":  # r5 AQE-advisory arm: own series
        return False
    if r.get("timed", "exec_only") != "exec_only":  # r5 exec-batch arm
        return False
    # r5: 64M runs use a 36g child heap (48g x2 OOMs the box at that size);
    # the 8M protocol series stays 48g-only so its 3-round history is
    # commensurable. Size-series rows accept any tagged heap.
    if rows == 8000000 and r.get("driver_mem", "48g") != "48g":
        return False
    if r.get("local_dirs", "/tmp") != medium:
        return False
    return all(r.get(k) == v for k, v in dict(DENSE, rows=rows).items())


def dense_row(r):
    return series_row(r, medium="/tmp", rows=8000000)


def main():
    s4, s16 = [], []
    prov = {"watch_rows": 0, "sampler_rows": 0}
    for path in sorted(glob.glob(os.path.join(REPO, "SCALING_RUNS_r*.jsonl"))):
        for line in open(path):
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            if not dense_row(r):
                continue
            prov["watch_rows"] += 1
            s4 += r.get("all_sec@4", [r.get("sec@4")])
            s16 += r.get("all_sec@16", [r.get("sec@16")])
    for sam in sorted(glob.glob(os.path.join(REPO, "SAMPLER_16C_r*.jsonl"))):
        for line in open(sam):
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            if dense_row(r) and r.get("cpus") == 16:
                prov["sampler_rows"] += 1
                s16.append(r["sec"])
    s4 = [x for x in s4 if x]
    s16 = [x for x in s16 if x]
    if not s4 or not s16:
        raise SystemExit(
            "protocol_headline: no /tmp protocol samples match the dense "
            f"profile {DENSE} — check SCALING_RUNS_r*.jsonl are present and "
            "rows carry the expected config/local_dirs fields"
        )
    m4, m16 = min(s4), min(s16)
    out = {
        "sec@4_min": m4,
        "sec@16_min": m16,
        "samples@4": len(s4),
        "samples@16": len(s16),
        "raw_efficiency": round(m4 / (4 * m16), 3),
        "speedup": round(m4 / m16, 2),
        "bar": 0.8,
        "sec@16_needed_at_bar": round(m4 / (4 * 0.8), 2),
        **prov,
    }
    # Parallel tmpfs series (same job + input, SPARK_LOCAL_DIRS on
    # /dev/shm, run in noisy-I/O windows where /tmp shuffle writes are
    # throttled by foreign dirty-page pressure — SHUFFLEDIR_AB_r4.jsonl).
    # Reported separately; NEVER mixed into the /tmp protocol minima.
    t4, t16, winrun = [], [], []
    for path in sorted(glob.glob(os.path.join(REPO, "SCALING_RUNS_r*.jsonl"))):
        for line in open(path):
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            if not series_row(r, medium="/dev/shm/spark-graft-local", rows=8000000):
                continue
            t4 += r.get("all_sec@4", [r.get("sec@4")])
            t16 += r.get("all_sec@16", [r.get("sec@16")])
            if r.get("scaling_efficiency"):
                winrun.append(r["scaling_efficiency"])
    if t4 and t16:
        tm4, tm16 = min(t4), min(t16)
        out["tmpfs_series"] = {
            "sec@4_min": tm4,
            "sec@16_min": tm16,
            "samples@4": len(t4),
            "samples@16": len(t16),
            "raw_efficiency": round(tm4 / (4 * tm16), 3),
            "within_run_efficiencies": winrun,
        }
    # r5 AQE-advisory arm (judge r4 #1a): same job + input, children run
    # with a non-default advisoryPartitionSizeInBytes. Reported as
    # within-run efficiencies only — each row is self-consistent (both
    # levels share the config) but the arm never feeds cross-run minima.
    adv_rows = []
    for path in sorted(glob.glob(os.path.join(REPO, "SCALING_RUNS_r*.jsonl"))):
        for line in open(path):
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            if r.get("advisory", "64m") == "64m" or r.get("rare_mode") == "dist":
                continue
            if not all(r.get(k) == v for k, v in DENSE.items()):
                continue
            adv_rows.append({
                "advisory": r["advisory"],
                "timed": r.get("timed", "exec_only"),
                "local_dirs": r.get("local_dirs", "/tmp"),
                "sec@4": r.get("sec@4"), "sec@16": r.get("sec@16"),
                "within_run_efficiency": r.get("scaling_efficiency"),
                "min_load": r.get("min_load"),
            })
    if adv_rows:
        out["advisory_arm"] = adv_rows
    # r5 exec-batch arm (judge r4 #1b): same job + input, but each sample
    # times B back-to-back executions and reports the per-exec mean, so the
    # ~0.3-0.5s cluster-size-independent per-execution driver constant
    # amortizes by 1/B. A documented protocol change — own series, never
    # mixed into the exec_only minima above.
    eb_rows = []
    for path in sorted(glob.glob(os.path.join(REPO, "SCALING_RUNS_r*.jsonl"))):
        for line in open(path):
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            if r.get("timed", "exec_only") == "exec_only":
                continue
            if not all(r.get(k) == v for k, v in DENSE.items()):
                continue
            eb_rows.append({
                "timed": r["timed"],
                "advisory": r.get("advisory", "64m"),
                "local_dirs": r.get("local_dirs", "/tmp"),
                "sec@4": r.get("sec@4"), "sec@16": r.get("sec@16"),
                "within_run_efficiency": r.get("scaling_efficiency"),
                "min_load": r.get("min_load"),
            })
    if eb_rows:
        out["exec_batch_arm"] = eb_rows
    # Size-scaling series (r4 rev h; generalized to 32/64/128M in r5): the
    # identical job at 4x/8x/16x the input, where the measured ~0.3-0.5 s
    # non-scaling per-execution constant shrinks proportionally. Evidence for
    # the claim that the proxy-scale efficiency is constant-bound, not
    # plan-bound: raw efficiency should RISE with input size if the plans
    # scale. Split by shuffle medium like the 8M series; never mixed into
    # the protocol minima.
    for nrows in (32_000_000, 64_000_000, 128_000_000):
        for medium, suffix in (("/tmp", ""), ("/dev/shm/spark-graft-local", "_tmpfs")):
            label = f"size_series_{nrows // 1_000_000}m{suffix}"
            b4, b16, bwin = [], [], []
            for path in sorted(glob.glob(os.path.join(REPO, "SCALING_RUNS_r*.jsonl"))):
                for line in open(path):
                    line = line.strip()
                    if not line:
                        continue
                    r = json.loads(line)
                    if not series_row(r, medium=medium, rows=nrows):
                        continue
                    b4 += r.get("all_sec@4", [r.get("sec@4")])
                    b16 += r.get("all_sec@16", [r.get("sec@16")])
                    if r.get("scaling_efficiency"):
                        bwin.append(r["scaling_efficiency"])
            b4 = [x for x in b4 if x]
            b16 = [x for x in b16 if x]
            if b4 and b16:
                bm4, bm16 = min(b4), min(b16)
                out[label] = {
                    "rows": nrows,
                    "sec@4_min": bm4,
                    "sec@16_min": bm16,
                    "samples@4": len(b4),
                    "samples@16": len(b16),
                    "raw_efficiency": round(bm4 / (4 * bm16), 3),
                    "rows_per_sec@16_min": round(nrows / bm16, 1),
                    "within_run_efficiencies": bwin,
                }
    if "--size-table" in sys.argv:
        print(size_table(out))
    else:
        print(json.dumps(out))


def size_table(out):
    """Render the tmpfs size-trend series (8M -> 32M -> 64M) as a markdown
    table, machine-derived from the same evidence rows as the JSON output
    so BASELINE.md can quote it without hand-maintained drift."""
    entries = []
    ts = out.get("tmpfs_series")
    if ts:
        entries.append((8_000_000, ts))
    for nrows in (32_000_000, 64_000_000, 128_000_000):
        e = out.get(f"size_series_{nrows // 1_000_000}m_tmpfs")
        if e:
            entries.append((nrows, e))
    lines = [
        "| input rows | sec@4 (min) | sec@16 (min) | rows/s @16c | raw eff (cross-run) | within-run effs |",
        "|---|---|---|---|---|---|",
    ]
    for nrows, e in entries:
        rps = e.get("rows_per_sec@16_min", round(nrows / e["sec@16_min"], 1))
        wins = ", ".join(f"{w:.3f}" for w in e.get("within_run_efficiencies", []))
        lines.append(
            f"| {nrows // 1_000_000}M | {e['sec@4_min']:.2f} | {e['sec@16_min']:.2f} "
            f"| {rps:,.0f} | {e['raw_efficiency']:.3f} | {wins} |"
        )
    return "\n".join(lines)


if __name__ == "__main__":
    main()
