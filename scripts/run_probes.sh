#!/bin/bash
# Unattended TPU probe battery (round 3). One process per probe group —
# only same-process numbers are comparable; cross-group comparisons are
# never needed. Ordered by decision value; generous timeouts because cold
# unrolled-HLO compiles through the axon tunnel run ~10-30 min each.
cd /root/repo
log=/tmp/probe_battery.log
: > "$log"
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> "$log"
  timeout "$1" "${@:2}" >> "$log" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S) ===" >> "$log"
}
run 5400 python bench.py
run 7200 python scripts/probe.py amgz
run 3600 python scripts/probe.py match
run 3600 python scripts/probe.py pembits
run 3600 python scripts/probe.py encbits
run 7200 python scripts/probe.py seg
run 7200 python scripts/bf16_budget.py
echo "BATTERY DONE $(date)" >> "$log"
