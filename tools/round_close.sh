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
    python3 tools/leakcheck.py "$round"
    git add -A
    git diff --cached --quiet || git commit -m \
      "Round-$round close: leak scan + remaining worktree artifacts"
    git status --short
    ;;
  *)
    echo "usage: round_close.sh open|close <round>" >&2; exit 2 ;;
esac
