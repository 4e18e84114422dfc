#!/usr/bin/env python3
"""Commit-pinned INTERLEAVED bench A/B — the only instrument that can
detect a real <=1.4x regression on this host.

This box's wall-clock swings +/-45% across measurement windows on
byte-identical code (round-9 311.6s vs round-10 215.7s, same commit), so
any cross-round comparison of two separately-recorded BENCH files is
noise below ~1.5x. The fix is to alternate the two builds WITHIN one
window: A B A B ... back to back, same process environment, and compare
per-query medians — window drift hits both sides equally.

Usage:
  python3 tools/ab_bench.py <commitA> <commitB> [--sf DIR] [--only REGEX]
                            [--reps N] [--cpus N] [--out FILE]

For each commit: a detached git worktree under /tmp is created (reused
if present) and compiled once with sbt. Bench then runs via a direct
`java -cp` launch (no sbt JVM in the timed path), alternating commits,
`reps` times each. Emits one JSON artifact with per-query times from
every rep, medians, and the B/A ratio — commit hashes pinned inside.

The artifact is written to --out (default AB_BENCH.json in the repo
root) for committing alongside the round's bench records.
"""
import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# must match build.sbt's jdk17AddOpens (Spark 4.x outside spark-submit)
ADD_OPENS_PKGS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


def run(cmd, **kw):
    print("+ " + " ".join(cmd), file=sys.stderr)
    return subprocess.run(cmd, check=True, **kw)


def worktree_for(commit):
    short = subprocess.check_output(
        ["git", "-C", REPO, "rev-parse", "--short", commit]).decode().strip()
    full = subprocess.check_output(
        ["git", "-C", REPO, "rev-parse", commit]).decode().strip()
    wt = f"/tmp/graft_ab_{short}"
    if not os.path.isdir(wt):
        run(["git", "-C", REPO, "worktree", "add", "--detach", wt, full])
    classes = os.path.join(wt, "target/scala-2.13/classes")
    if not os.path.isdir(classes) or not os.listdir(classes):
        run(["sbt", "-batch", "compile"], cwd=wt)
    return short, full, wt


def bench_once(wt, sf, only, cpus, tag):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_BENCH_OUT=f"/tmp/graft_ab_out_{tag}.json")
    if only:
        env["SPARK_GRAFT_ONLY"] = only
    # a leftover record from a previous invocation must never be read as
    # this run's result — remove it so a missing write is a loud error
    if os.path.exists(env["SPARK_GRAFT_BENCH_OUT"]):
        os.remove(env["SPARK_GRAFT_BENCH_OUT"])
    cp = os.path.join(wt, "target/scala-2.13/classes") + ":/opt/spark/jars/*"
    cmd = ["java", "-Xmx48g", "-Dspark.ui.enabled=false",
           "-Dspark.sql.session.timeZone=UTC"]
    for p in ADD_OPENS_PKGS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += ["-cp", cp, "graft.Bench"]
    run(cmd, cwd=wt, env=env, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL)
    with open(env["SPARK_GRAFT_BENCH_OUT"]) as f:
        rec = json.loads(f.read())
    assert rec.get("sf") == sf, f"record sf {rec.get('sf')} != requested {sf}"
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("commitA")
    ap.add_argument("commitB")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO, "AB_BENCH.json"))
    args = ap.parse_args()
    if args.reps < 1:
        ap.error("--reps must be >= 1 (the summary math needs at least "
                 "one rep per side)")

    shortA, fullA, wtA = worktree_for(args.commitA)
    shortB, fullB, wtB = worktree_for(args.commitB)

    runs = {"A": [], "B": []}
    # ABBA interleave: alternating the pair order per rep cancels LINEAR
    # window drift, which plain ABAB converts into a systematic advantage
    # for whichever side always runs first (observed: a decaying window
    # inflated every B-side tail row in the first full run of this tool)
    for rep in range(args.reps):
        pair = (("A", wtA), ("B", wtB)) if rep % 2 == 0 else (("B", wtB), ("A", wtA))
        for side, wt in pair:
            rec = bench_once(wt, args.sf, args.only, args.cpus,
                             f"{side}{rep}")
            runs[side].append(rec)
            print(f"[ab] rep {rep} side {side}: total "
                  f"{rec.get('value'):.1f}s, {rec.get('n_queries')} queries, "
                  f"failed {rec.get('failed')}", file=sys.stderr)

    # MIN across reps, not median: this host's throttle bursts are
    # one-sided multi-x spikes on identical code (observed: text_quality
    # 12.96s in one rep vs 0.28-0.33s in the other three), and with few
    # reps a median is contaminated by a single burst while the min is
    # the honest warm-cost estimate — the same reasoning ScaleProbe
    # documents for its min-of-two timing. Medians are kept alongside
    # for inspection.
    def agg(side, f):
        qs = {}
        for rec in runs[side]:
            for q, t in rec["queries"].items():
                qs.setdefault(q, []).append(t)
        return {q: f(ts) for q, ts in qs.items()}

    minA, minB = agg("A", min), agg("B", min)
    medA, medB = agg("A", statistics.median), agg("B", statistics.median)
    shared = sorted(set(minA) & set(minB))
    per_query = {
        q: {"a": minA[q], "b": minB[q],
            "a_med": medA[q], "b_med": medB[q],
            "ratio": round(minB[q] / minA[q], 3) if minA[q] > 0 else None}
        for q in shared}
    sumA = sum(minA[q] for q in shared)
    sumB = sum(minB[q] for q in shared)
    out = {
        "commit_a": {"short": shortA, "full": fullA},
        "commit_b": {"short": shortB, "full": fullB},
        "sf": args.sf, "only": args.only, "reps": args.reps,
        "cpus": args.cpus,
        "harness": runs["A"][0].get("harness"),
        "shared_queries": len(shared),
        "sum_a_sec": round(sumA, 3), "sum_b_sec": round(sumB, 3),
        "ratio_b_over_a": round(sumB / sumA, 4) if sumA else None,
        "per_query": per_query,
        "raw_totals": {s: [r.get("value") for r in runs[s]] for s in runs},
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"[ab] {shortB} vs {shortA}: shared-sum ratio "
          f"{out['ratio_b_over_a']} ({sumB:.1f}s / {sumA:.1f}s) "
          f"-> {args.out}", file=sys.stderr)
    worst = sorted((v["ratio"], q) for q, v in per_query.items()
                   if v["ratio"] and v["a"] + v["b"] > 1.0)[-5:]
    print("[ab] slowest-growing (sub-second rows excluded): " +
          ", ".join(f"{q} {r}x" for r, q in worst), file=sys.stderr)


if __name__ == "__main__":
    main()
