#!/bin/bash
# Round-4 TPU probe battery: measure the round-3 staged knobs and the two
# proven seg gaps (NMS-tail composition drag, encoder non-GEMM overhead).
# One process per probe group; only same-process numbers are comparable.
cd /root/repo
log=/tmp/probe_battery_r4.log
: > "$log"
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> "$log"
  timeout "$1" "${@:2}" >> "$log" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S) ===" >> "$log"
}
run 5400 python bench.py
run 7200 python scripts/probe.py amgz
run 7200 python scripts/probe.py seg
run 3600 python scripts/probe.py match
echo "BATTERY DONE $(date)" >> "$log"
