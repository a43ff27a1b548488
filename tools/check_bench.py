#!/usr/bin/env python3
"""Per-query bench regression gate against the committed floor.

Usage: check_bench.py <bench_json_file> [floor_json]

<bench_json_file> holds the Bench main's JSON line ({"metric":"total",...,
"queries":{...}}), or a driver BENCH_r*.json whose "tail" contains that line.

The gate is DIFFERENTIAL: each query's floor is first scaled by a measured
load factor (clamped to >= 1), which cancels uniform machine-load shifts —
measured same-code totals range 34-73 s at sf0.1 depending on co-tenant
load, and a whole-run multiplier is environment, not regression.

The load factor is anchored on the Bench main's SENTINEL when the artifact
carries one (round-16): a pinned CPU-shaped calibration probe run at the
start and end of every pass (its MIN, matching the per-query min-over-pass
statistic), compared against the committed "_sentinel" floor. A real
MULTI-QUERY regression cannot inflate it the way it inflates the median
got/floor ratio — but the sentinel runs through the same Spark engine, so
an ENGINE-WIDE regression (codegen, scheduler, GC pressure) slows it
proportionally and loosens the floors with it; a load factor beyond
plausible co-tenant contention (> 2.5x) therefore FAILS the gate (exit 1,
the run is ungateable — re-run quiet), because scaling every floor by it
would wave through a uniform engine regression of the same size. "The
sentinel says 3x" on a machine you know is quiet means the ENGINE
regressed, not the machine.
Artifacts without a sentinel (older rounds) fall back to the run's median
got/floor ratio, which a broad regression partially masks (it still caught
q199/q200 in round 15).
A query then regresses when it is BOTH >1.5x its load-adjusted floor AND
>0.4s absolute over it — the absolute guard keeps sub-0.3s queries from
flagging on timer noise. A genuine single-query regression moves that query
away from the run's median and still flags.
Exit 1 on any regression (or any query missing from the bench run).

Protocol on SLOW: a load that RAMPS mid-run defeats the median correction
(the tail of the run flags as a block — seen once with co-tenant load ramping
a run from 34s-pace to 73s total). A contiguous block of SLOW queries in run
order means re-run on a quiet machine; believe a SLOW only when it reproduces.
"""
import json
import re
import statistics
import sys

RATIO = 1.5
ABS_SLACK = 0.4


def load_line(path: str, _depth: int = 0) -> dict:
    """Accept either format:
    1. raw Bench stdout — one JSON line {"metric":"total",...,"queries":{...}}
       (possibly duplicated across stdout/stderr in a merged capture);
    2. a driver BENCH_r*.json — a pretty-printed wrapper object holding the
       bench line pre-parsed under "parsed" and the raw capture under "tail".
    Every candidate is collected and the first with a non-empty "queries"
    map wins; a tolerant regex over the (unescaped) raw text is the last
    resort for truncated tails.
    """
    raw = open(path).read()
    candidates = []
    # whole-file JSON first: the driver wrapper never fits on one line, so
    # the line-oriented scan below would miss it entirely (this was the bug
    # that made rounds 1-5 report "no bench queries found" on driver files)
    try:
        whole = json.loads(raw)
    except json.JSONDecodeError:
        whole = None
    if isinstance(whole, dict):
        candidates.append(whole)
        if isinstance(whole.get("parsed"), dict):
            candidates.append(whole["parsed"])
        for line in (whole.get("tail") or "").splitlines():
            if line.lstrip().startswith("{"):
                try:
                    candidates.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
    # raw bench stdout: first line(s) that parse
    for line in raw.splitlines():
        if line.lstrip().startswith("{"):
            try:
                candidates.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    for d in candidates:
        if isinstance(d, dict) and isinstance(d.get("queries"), dict) \
                and d["queries"]:
            return d
    # terminal compact tier (196+ queries): the stdout line carries no
    # per-query map, only a "queries_in" pointer at the full-precision
    # BENCH_LOCAL.json the Bench main writes beside the repo root
    import os
    for d in candidates:
        # cap pointer-follow depth at 1: a self-referencing or chained
        # pointer must not recurse (round-12 ADVICE #3) — and must FAIL BY
        # NAME rather than fall through to the garbled-text scan's generic
        # "no bench queries" error (round-13 ADVICE #4)
        if isinstance(d, dict) and d.get("queries_in") and _depth >= 1:
            sys.exit(
                f"chained queries_in pointer: {path} points at "
                f"{d['queries_in']} but is itself pointer-resolved — "
                f"refusing to follow a pointer chain")
        if isinstance(d, dict) and d.get("queries_in") and _depth < 1:
            for base in (os.path.dirname(os.path.abspath(path)), os.getcwd()):
                p = os.path.join(base, d["queries_in"])
                if os.path.exists(p):
                    resolved = load_line(p, _depth=_depth + 1)
                    # consistency gate: a stale/foreign BENCH_LOCAL.json
                    # (e.g. overwritten by a later sf0.01 run) must not
                    # silently gate the wrong numbers — the compact line
                    # carries n_queries for exactly this cross-check
                    n_expect = d.get("n_queries")
                    n_got = len(resolved.get("queries") or {})
                    if isinstance(n_expect, int) and n_got != n_expect:
                        sys.exit(
                            f"queries_in pointer mismatch: {path} says "
                            f"n_queries={n_expect} but {p} holds {n_got} — "
                            f"stale or foreign BENCH_LOCAL.json, refusing to gate")
                    return resolved
    # truncated/garbled capture: find a queries object in the text, whether
    # JSON-escaped (inside a "tail" string: \"queries\":) or pretty-printed
    # ("queries": { with whitespace)
    m = re.search(r'"queries":\s*({[^{}]*})', raw.replace('\\"', '"'))
    if m:
        try:
            return {"queries": json.loads(m.group(1))}
        except json.JSONDecodeError:
            pass
    sys.exit(f"no bench queries found in {path}")


def normalize(d: dict) -> dict:
    """Undo the compact stdout encodings (round 11+): integer centisecond
    values ("queries_unit":"centiseconds") back to seconds, and q-stripped
    keys ("key_prefix":"q") back to qNN. Full-format lines pass through."""
    qs = d["queries"]
    prefix = d.get("key_prefix", "")
    scale = 0.01 if d.get("queries_unit") == "centiseconds" else 1.0
    return {prefix + k: (v if v < 0 else v * scale) for k, v in qs.items()}


def main(bench_path: str, floor_path: str = "BENCH_FLOOR.json") -> int:
    line = load_line(bench_path)
    bench = normalize(line)
    floor_all = json.load(open(floor_path))
    floor = {k: v for k, v in floor_all.items() if not k.startswith("_")}
    # Bench emits the short qNN prefix as the key (keeps the driver's
    # 2 KB stdout tail window safe); the floor keeps full names.
    def lookup(name):
        return bench.get(name, bench.get(name.split("_")[0]))

    sent = line.get("sentinel")
    sfloor = floor_all.get("_sentinel")
    if isinstance(sent, (int, float)) and sent > 0 \
            and isinstance(sfloor, (int, float)) and sfloor > 0:
        load = max(1.0, sent / sfloor)
        sentinel_anchored = True
        anchor = (f"sentinel {sent:.2f}s vs _sentinel floor {sfloor:.2f}s "
                  "(measured anchor)")
    else:
        ratios = [lookup(n) / f for n, f in floor.items()
                  if lookup(n) is not None and lookup(n) > 0]
        load = max(1.0, statistics.median(ratios)) if ratios else 1.0
        sentinel_anchored = False
        anchor = ("median got/floor ratio — no sentinel in artifact or no "
                  "_sentinel floor; a broad regression can partially mask "
                  "itself under this anchor")
    if load > 1.1:
        print(f"NOTE uniform load factor {load:.2f}x via {anchor}; "
              "gate is differential")
    implausible_load = load > 2.5
    if implausible_load:
        cause = ("the sentinel runs through the same engine and cannot tell "
                 "machine load from an engine-wide regression"
                 if sentinel_anchored else
                 "the median ratio cannot tell machine load from a broad "
                 "multi-query regression")
        print(f"SLOW _load_factor: {load:.2f}x is beyond plausible co-tenant "
              f"contention for this box — re-run on a quiet machine; {cause}. "
              "This run CANNOT gate (exit 1): scaling every floor by "
              f"{load:.2f}x would wave through a uniform regression of the "
              "same size")
    bad = []
    for name, f in sorted(floor.items()):
        got = lookup(name)
        adj = f * load
        if got is None or got < 0:
            bad.append(f"{name}: missing/failed in bench run")
        elif got > adj * RATIO and got - adj > ABS_SLACK:
            bad.append(f"{name}: {got:.2f}s vs load-adjusted floor {adj:.2f}s "
                       f"({got / adj:.1f}x)")
        else:
            print(f"OK   {name}: {got:.2f}s (floor {f:.2f}s, adj {adj:.2f}s)")
    for b in bad:
        print(f"SLOW {b}")
    # A bench query with no floor entry is silently ungated — surface it.
    floor_keys = {k for k in floor} | {k.split("_")[0] for k in floor}
    for extra in sorted(set(bench) - floor_keys):
        print(f"WARN {extra}: in bench run but absent from {floor_path} "
              "(no regression gate)")
    print(f"\n{len(floor) - len(bad)} ok, {len(bad)} regressed" +
          (" (AND load factor implausible — ungateable run)"
           if implausible_load else ""))
    return 1 if bad or implausible_load else 0


if __name__ == "__main__":
    if not 2 <= len(sys.argv) <= 3:
        sys.exit(__doc__.strip().splitlines()[2])  # the Usage: line
    sys.exit(main(*sys.argv[1:]))
