#!/bin/bash
# Clean-window hunter (round-5 evidence harness): qualifies the host with
# the shared graft.bench.Probe instruments (same 4-thread stream-sum
# floor the evidence file cites), and fires the next queued evidence job
# when a clean window appears. Queue lines are full shell commands
# in /tmp/hunt_queue, popped one at a time; everything logs to
# /tmp/hunt_runs.log and every probe reading is appended to
# /tmp/probe_log.txt so the window record survives either verdict.
#
# Firing criterion (hardened after a round-5 false start: one marginal
# clean probe fired a set straight into a co-tenant spike that held the
# warm-up under load-17 for 25+ minutes):
#   1. loadavg(1m) < 4 BEFORE spending a probe — nothing of ours runs
#      between jobs, so any load is a co-tenant (a probe costs ~20 s of
#      full-box time; don't burn it to confirm what /proc already says);
#   2. TWO consecutive clean probes ~45 s apart — a single reading at
#      the 17 GB/s floor says nothing about the window's persistence,
#      and the jobs need 10-15 clean minutes, not one clean second.
#
# Usage: tools/hunt.sh [queue-file]   (run from the repo root)
set -u
cd "$(dirname "$0")/.."
export CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export GRAFT_JAVA_OPTS="$OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
QUEUE=${1:-/tmp/hunt_queue}
# Hardened after the round-5 final session lost two sets to /tmp +
# process-tree death: console and probe logs live in the repo tree
# (survives reboot AND session kill), and every finished job's
# BENCH/BASELINE.md append is committed immediately.
LOG=BENCH/logs/hunt_runs_live.log
PROBELOG=BENCH/logs/probe_log_live.txt
mkdir -p BENCH/logs

probe_clean() {  # one probe; echoes the JSON line; rc 0 iff clean
  # Hardened 07:48Z after the first CORE-stealing co-tenant of the
  # round (07:45Z set, register-probe ceilings 0.54/0.63): a clean
  # probe now requires the 4-thread LCG rate >= 2.85e9 (clean range
  # this round: 2.90-3.18e9) in addition to Probe's own bw floor —
  # a DRAM-only gate cannot see a core thief.
  local line
  line=$(java $OPENS -Xmx4g -cp "$CP" graft.bench.Probe 4 16 2>/dev/null | tail -1)
  echo "$(date -u +%H:%M:%S) $line" >> "$PROBELOG"
  echo "$line"
  echo "$line" | grep -q '"clean":true' || return 1
  # fail CLOSED when the lcgA field is missing/unparsed: awk must see
  # exactly one value AND it must clear the floor (an empty pipe used to
  # skip the block and return 0 — a core thief passed as clean)
  echo "$line" | grep -oE '"lcgA":[0-9.e+]+' | cut -d: -f2 | \
    awk 'NR==1{ok=($1 >= 2.85e9)} END{exit !(NR==1 && ok)}'
}

while true; do
  if ! awk '{exit !($1 < 4.0)}' /proc/loadavg; then
    sleep 90; continue
  fi
  if ! line1=$(probe_clean); then sleep 90; continue; fi
  sleep 45
  if ! line2=$(probe_clean); then sleep 90; continue; fi
  job=$(head -1 "$QUEUE" 2>/dev/null || true)
  if [ -z "${job:-}" ]; then echo "$(date -u) queue empty, exiting" >> "$LOG"; exit 0; fi
  sed -i '1d' "$QUEUE"
  echo "=== $(date -u) CLEAN x2 ($line1 | $line2), firing: $job" >> "$LOG"
  bash -c "$job" >> "$LOG" 2>&1
  rc=$?
  echo "=== $(date -u) job finished rc=$rc" >> "$LOG"
  # commit the machine-appended evidence set the moment it lands, so a
  # later kill/reboot cannot take it. PATHSPEC commit: a bare commit
  # would sweep whatever another session has staged (including source)
  # into this doc-only commit; the explicit paths make that impossible.
  # git errors land in $LOG and the commit retries once after a short
  # sleep (index.lock collisions with an interactive session).
  msg="Evidence append: $(echo "$job" | grep -oE '[0-9]+ [0-9]+ [a-z-]+$' || echo job) rc=$rc (hunter auto-commit)"
  git add BENCH/BASELINE.md BENCH/logs >> "$LOG" 2>&1
  if ! git commit -q -m "$msg" -- BENCH/BASELINE.md BENCH/logs >> "$LOG" 2>&1; then
    sleep 10
    git commit -q -m "$msg" -- BENCH/BASELINE.md BENCH/logs >> "$LOG" 2>&1 \
      || echo "=== $(date -u) evidence commit FAILED twice — append is uncommitted" >> "$LOG"
  fi
done
