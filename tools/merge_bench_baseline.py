#!/usr/bin/env python3
"""Merge full-coverage Bench runs into the committed bench_baseline.json.

Usage: python3 tools/merge_bench_baseline.py <bench1.json> [bench2.json ...]
           [-o bench_baseline.json] [--note "..."]

Per-query wall seconds take the MIN across runs (each run is already a
min over Bench's interleaved passes, so N runs give min over 3N reps —
the stable statistic on a host whose full-run totals swing ±20%).
The deterministic axes (shuffle_mb / exchanges / plan_nodes, setup_sec)
are copied from the FIRST run and must agree across runs up to rounding;
a disagreement means the plan moved mid-refresh and the merge aborts.

Refuses to write a baseline whose sentinel series shows hot firings in
every contributing run — a baseline built entirely under pressure would
bake contention into the reference numbers. One clean run is enough.
"""
import json, sys

def load(path):
    with open(path) as f:
        return json.load(f)

def main():
    args = sys.argv[1:]
    out = "bench_baseline.json"
    note = None
    paths = []
    i = 0
    while i < len(args):
        if args[i] == "-o":
            out = args[i + 1]; i += 2
        elif args[i] == "--note":
            note = args[i + 1]; i += 2
        else:
            paths.append(args[i]); i += 1
    if not paths:
        sys.exit(__doc__)
    runs = [load(p) for p in paths]

    names = set(runs[0]["queries"])
    for p, r in zip(paths[1:], runs[1:]):
        if set(r["queries"]) != names:
            sys.exit(f"query sets differ: {paths[0]} vs {p} "
                     f"(symmetric diff {set(r['queries']) ^ names})")
    sfs = {r.get("sf") for r in runs}
    if len(sfs) != 1:
        sys.exit(f"runs are at different scale factors: {sfs}")
    # every contributing run must have measured the SAME fixture
    # generation — wall mins merged across data generations would bake
    # the round-9 false-regression class into the reference numbers
    fps = {r.get("fixture") for r in runs}
    if None in fps:
        sys.exit("a contributing run carries no fixture fingerprint — "
                 "re-run Bench (it stamps one) before refreshing the baseline")
    if len(fps) != 1:
        sys.exit(f"runs measured different fixture generations: {fps} — "
                 "the testdata was regenerated mid-refresh; re-run all "
                 "contributing benches on the current fixtures")
    for r, p in zip(runs, paths):
        if r.get("errors"):
            sys.exit(f"{p} carries errors — baseline runs must be clean: "
                     f"{list(r['errors'])[:3]}")

    # deterministic axes must agree (same code + same data => same plan)
    # up to AQE runtime-replan variance: borderline broadcast/coalesce
    # decisions can move one exchange / a few nodes between runs (s14
    # observed 14 vs 15 exchanges with identical shuffle volume), so
    # the tolerance is ±1 exchange / ±5 nodes and the baseline stores
    # the MIN — the tracker's "any increase" bar then fires only on
    # growth past the variance band actually observed. shuffle_mb gets
    # the tracker's own band (>10% AND >1 MB): map-side partial-agg
    # EMISSION varies with task input chunking (w09's distinct-Expand
    # measured 1.79 vs 2.08 MB across clean same-commit runs), so a
    # flat sub-MB bar trips on combine jitter, not plan moves.
    # plan_nodes likewise: iterative queries sum nodes across dozens of
    # per-round executions, and AQE adds/removes a coalesce node or two
    # per round (g07 measured 393 vs 404 across clean same-commit runs)
    # — so past ±5 the bar is relative (3%), which a real per-round
    # structural change (>= 1 node x rounds) still clears.
    def shuffle_disagrees(a, b):
        return abs(a - b) > 1.0 and abs(a - b) > 0.1 * max(a, b)
    # exchanges: ±2, not ±1 — ONE borderline AQE broadcast decision flips
    # a join between SMJ (two exchanges) and BHJ (zero), so a single
    # replan moves the count by 2, and the same flip swaps ~10 plan
    # nodes (sorts + exchanges + AQE wrappers: s08 measured 5 vs 7
    # exchanges and 78 vs 88 nodes across clean same-commit runs); the
    # baseline stores the MIN either way, and the in-run tracker's own
    # regression bars (any exchange increase; >25% and >5 nodes vs the
    # baseline MIN) remain the actual structural gate.
    for axis, disagrees in (
            ("shuffle_mb", shuffle_disagrees),
            ("exchanges", lambda a, b: abs(a - b) > 2),
            ("plan_nodes",
             lambda a, b: abs(a - b) > 12 and abs(a - b) > 0.03 * max(a, b))):
        base = runs[0].get(axis, {})
        for p, r in zip(paths[1:], runs[1:]):
            cur = r.get(axis, {})
            for k in set(base) & set(cur):
                if disagrees(base[k], cur[k]):
                    sys.exit(f"{axis} disagrees for {k}: {base[k]} in "
                             f"{paths[0]} vs {cur[k]} in {p} — the plan "
                             "moved mid-refresh; re-run both on one commit")

    # pressure check: at least one run must be sentinel-clean
    def hot_count(r):
        bar = r.get("sentinel_hot_bar")
        series = [x for p in r.get("sentinel_sec", []) for x in p]
        if bar is None or not series:
            return None
        return sum(1 for x in series if x > bar)
    hots = [hot_count(r) for r in runs]
    if all(h is None or h > 0 for h in hots):
        sys.exit(f"every contributing run shows hot sentinel firings "
                 f"({hots}) — refresh on a quiet host instead of baking "
                 "pressure into the baseline")

    merged = {k: min(r["queries"][k] for r in runs) for k in sorted(names)}
    total = sum(merged.values())
    result = {
        "metric": "total", "value": round(total, 3), "unit": "sec",
        "queries": {k: round(v, 3) for k, v in merged.items()},
        "errors": {}, "n_queries": len(merged),
        "per_query_mean": round(total / len(merged), 3),
        "sf": runs[0].get("sf"),
        "fixture": runs[0].get("fixture"),
        "setup_sec": runs[0].get("setup_sec", {}),
    }
    for axis in ("shuffle_mb", "exchanges", "plan_nodes"):
        maps = [r.get(axis, {}) for r in runs]
        keys = set().union(*[set(m) for m in maps])
        result[axis] = {
            k: min(m[k] for m in maps if k in m) for k in sorted(keys)}
    if note:
        result["note"] = note
    with open(out, "w") as f:
        json.dump(result, f, separators=(",", ":"))
        f.write("\n")
    print(f"wrote {out}: {len(merged)} queries, {total:.1f} s total, "
          f"{total / len(merged):.3f} s/query "
          f"(min over {len(runs)} run(s); sentinel hot counts {hots})")

if __name__ == "__main__":
    main()
