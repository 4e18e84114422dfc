#!/usr/bin/env bash
# Round bookkeeping (VERDICT r11 #1: make the artifact discipline
# structural, not a memory item). Two duties:
#
#   tools/round_close.sh open <prev_round>
#     Run at the START of a round. The driver's round-close commit left
#     BENCH_FULL.json holding the previous round's promote-guarded full
#     record but no self-contained per-round archive (BENCH_r{N}.json is
#     a truncated stdout scrape). Archive it as BENCH_r<prev>_full.json,
#     refresh LEAKCHECK.json with provenance for the new round, commit.
#
#   tools/round_close.sh close <round>
#     Run at the END of a round, before handing back to the driver:
#     refresh LEAKCHECK.json (provenance-stamped) and commit anything
#     still sitting in the worktree so the driver's round-close commit
#     only ever adds ITS artifacts.
set -euo pipefail
cd "$(dirname "$0")/.."

mode="${1:?usage: round_close.sh open|close <round>}"
round="${2:?usage: round_close.sh open|close <round>}"

case "$mode" in
  open)
    archive="BENCH_r${round}_full.json"
    if [[ ! -f "$archive" ]]; then
      cp BENCH_FULL.json "$archive"
      echo "[round] archived BENCH_FULL.json -> $archive"
    else
      echo "[round] $archive already exists, leaving it"
    fi
    python3 tools/leakcheck.py "$((round + 1))"
    git add "$archive" LEAKCHECK.json
    git diff --cached --quiet || git commit -m \
      "Archive round-$round full bench record; refresh leak scan"
    ;;
  close)
    # Commit pending work FIRST: the cross-round A/B pins worktrees at
    # commits, so HEAD must be the tree being measured.
    git add -A
    git diff --cached --quiet || git commit -m \
      "Round-$round close: remaining worktree artifacts"
    # One full-registry interleaved ABBA vs the previous round's close
    # commit (VERDICT r12 #3): without it every round's full-suite
    # delta stays window-ambiguous (this host swings ±45% on identical
    # code). The driver's close commits are titled "round N: ...".
    base="$(git log --grep "^round $((round - 1)):" --format=%H -n 1 || true)"
    if [[ -n "$base" ]]; then
      python3 tools/ab_bench.py "$base" HEAD --reps 2 --out AB_BENCH_round.json
    else
      echo "[round] no round-$((round - 1)) close commit found; skipping cross-round ABBA"
    fi
    python3 tools/leakcheck.py "$round"
    git add -A
    git diff --cached --quiet || git commit -m \
      "Round-$round close: cross-round ABBA + leak scan"
    git status --short
    ;;
  *)
    echo "usage: round_close.sh open|close <round>" >&2; exit 2 ;;
esac
