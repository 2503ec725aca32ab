#!/bin/bash
# Regenerate every per-config bench artifact at HEAD, serially (one
# fresh process per config; never run anything else on the chip while
# this is going — concurrent use contaminates the timings).
#
#   bash scripts/bench_all.sh [config ...]
#
# Configs: lr18 fast d240 disp line hr rgb (default: all).
set -u
cd "$(dirname "$0")/.."

run() {  # run <env...> -- <artifact>
    local envs=()
    while [ "$1" != "--" ]; do envs+=("$1"); shift; done
    shift
    local out="$1"
    echo "=== ${out} (${envs[*]:-default}) ==="
    env "${envs[@]}" python bench.py > "/tmp/${out}.tmp" \
        2> "/tmp/${out}.log"
    local rc=$?
    if grep -q '^{' "/tmp/${out}.tmp"; then
        grep '^{' "/tmp/${out}.tmp" | tail -1 > "${out}"
        cat "${out}"
    fi
    [ $rc -ne 0 ] && echo "!!! ${out} exited rc=$rc (gate failure?)"
    return 0
}

for cfg in "${@:-lr18 fast d240 disp line hr rgb}"; do
  for c in $cfg; do
    case "$c" in
      lr18) run -- BENCH_WARM.json ;;
      fast) run BENCH_FAST=1 -- BENCH_FASTMODE.json ;;
      d240) run BENCH_D240=1 -- BENCH_D240.json ;;
      disp) run BENCH_SCORE=disp -- BENCH_DISP.json ;;
      line) run BENCH_SCORE=line -- BENCH_LINE.json ;;
      hr)   run BENCH_HR=1 -- BENCH_HR.json ;;
      rgb)  run BENCH_RGB=1 -- BENCH_RGB.json ;;
      *) echo "unknown config $c" ;;
    esac
  done
done
