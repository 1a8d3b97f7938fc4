#!/usr/bin/env python3
"""Aggregate bench/scale_r4_rep*.jsonl (graft.BenchScale output) into
the BENCH.md round-4 scaling table: per-kernel throughput by core count
across repeats, plus N->4N efficiency computed WITHIN each repeat (same
tenancy window) and the across-repeat median, mirroring the round-3
protocol so the two rounds are directly comparable."""
import json, glob, statistics, sys, re, collections

if len(sys.argv) > 1 and sys.argv[1] == "--cluster":
    # Pseudo-cluster ladder (tools/cluster_ladder.sh): one file per
    # repeat, legs cores=4 (local-cluster[1,4,..]) and cores=16
    # (local-cluster[4,4,..]); repeats grouped by replication series
    # (pass length). Reproduces the BENCH.md per-series tables.
    series = collections.defaultdict(list)  # replication -> [(tag, rows)]
    for path in sorted(glob.glob("bench/scale_r4_cluster_rep*.jsonl")):
        rows = {}
        with open(path) as f:
            for ln in f:
                ln = ln.strip()
                if ln:
                    r = json.loads(ln)
                    if r["cores"] in rows:
                        # cluster_ladder.sh appends with >>, so a rerun
                        # under the same tag would silently mix legs from
                        # different runs; make that loud instead.
                        print(f"WARNING: {path} has multiple cores={r['cores']} "
                              "lines (rerun under the same tag?); keeping the last",
                              file=sys.stderr)
                    rows[r["cores"]] = r
        if rows:
            tag = re.search(r"rep(\w+)\.jsonl$", path).group(1)
            series[next(iter(rows.values())).get("replication", 4)].append((tag, rows))
    if not series:
        sys.exit("no cluster ladder files found")
    for repl in sorted(series):
        reps = series[repl]
        print(f"\n## replication {repl} ({len(reps)} repeats: "
              f"{', '.join(t for t, _ in reps)})")
        print("| repeat | fast 1x4 med/best | fast 4x4 med/best | "
              "ref 1x4 med/best | ref 4x4 med/best | "
              "fast eff med/best | ref eff med/best |")
        print("|---" * 7 + "|")
        agg = {k: ([], []) for k, _ in
               [("fast", "pairs_per_sec"), ("ref", "ref_kernel_pairs_per_sec")]}
        for tag, rows in reps:
            if 4 not in rows or 16 not in rows:
                print(f"| rep{tag} | (incomplete: legs {sorted(rows)}) |"
                      + " — |" * 5)
                continue
            cells, effs = [], []
            for kshort, key in [("fast", "pairs_per_sec"),
                                ("ref", "ref_kernel_pairs_per_sec")]:
                for c in (4, 16):
                    cells.append(f"{rows[c][key + '_median']:,.0f} / "
                                 f"{rows[c][key]:,.0f}")
                em = (rows[16][key + "_median"] / rows[4][key + "_median"]) / 4
                eb = (rows[16][key] / rows[4][key]) / 4
                agg[kshort][0].append(em)
                agg[kshort][1].append(eb)
                effs.append(f"{em:.3f} / {eb:.3f}")
            print(f"| rep{tag} | " + " | ".join(cells + effs) + " |")
        for kshort in ("fast", "ref"):
            em, eb = agg[kshort]
            if em:
                print(f"{kshort} median of {len(em)}: "
                      f"{statistics.median(em):.3f} med-based / "
                      f"{statistics.median(eb):.3f} best-based")
    sys.exit(0)

reps = []
for path in sorted(glob.glob("bench/scale_r4_rep*.jsonl") or
                   glob.glob("target/scale_r4_rep*.jsonl")):
    rows = {}
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if ln:
                r = json.loads(ln)
                if r["cores"] in rows:
                    print(f"WARNING: {path} has multiple cores={r['cores']} "
                          "lines (rerun under the same tag?); keeping the last",
                          file=sys.stderr)
                rows[r["cores"]] = r
    if rows:
        reps.append((path, rows))

if not reps:
    sys.exit("no ladder files found")

KERNELS = [("fast (default)", "pairs_per_sec"), ("reference", "ref_kernel_pairs_per_sec")]
CORES = [4, 8, 16, 32]

print(f"repeats: {len(reps)} ({', '.join(p for p, _ in reps)})\n")
print("### Full-feature throughput (pairs/s)")
print("| kernel | cores | " + " | ".join(f"rep{i+1} med / best" for i in range(len(reps))) + " | median-of-medians |")
print("|---" * (3 + len(reps)) + "|")
for kname, key in KERNELS:
    for c in CORES:
        cells, meds = [], []
        for _, rows in reps:
            r = rows.get(c)
            if r is None:
                cells.append("—")
                continue
            med, best = r[key + "_median"], r[key]
            meds.append(med)
            cells.append(f"{med:,.0f} / {best:,.0f}")
        mom = statistics.median(meds) if meds else float("nan")
        print(f"| {kname} | {c} | " + " | ".join(cells) + f" | {mom:,.0f} |")

print("\n### N -> 4N efficiency (within-repeat)")
print("| kernel | pair | " + " | ".join(f"rep{i+1} (med-based)" for i in range(len(reps))) + " | median | best-based median |")
print("|---" * (4 + len(reps)) + "|")
for kname, key in KERNELS:
    for lo, hi in [(4, 16), (8, 32)]:
        effs_med, effs_best, cells = [], [], []
        for _, rows in reps:
            if lo in rows and hi in rows:
                em = (rows[hi][key + "_median"] / rows[lo][key + "_median"]) / 4
                eb = (rows[hi][key] / rows[lo][key]) / 4
                effs_med.append(em)
                effs_best.append(eb)
                cells.append(f"{em:.3f}")
            else:
                cells.append("—")
        if effs_med:
            print(f"| {kname} | {lo}->{hi} | " + " | ".join(cells) +
                  f" | {statistics.median(effs_med):.3f} | {statistics.median(effs_best):.3f} |")
