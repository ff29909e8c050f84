#!/bin/bash
# Clean-window hunter (round-5 evidence harness): qualifies the host with
# the shared graft.bench.Probe instruments (same 4-thread stream-sum
# floor the evidence file cites), and fires the next queued evidence job
# the moment a clean window appears. Queue lines are full shell commands
# in /tmp/hunt_queue, popped one at a time; everything logs to
# /tmp/hunt_runs.log and every probe reading is appended to
# /tmp/probe_log.txt so the window record survives either verdict.
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
LOG=/tmp/hunt_runs.log
while true; do
  line=$(java $OPENS -Xmx4g -cp "$CP" graft.bench.Probe 4 16 2>/dev/null | tail -1)
  echo "$(date -u +%H:%M:%S) $line" >> /tmp/probe_log.txt
  if echo "$line" | grep -q '"clean":true'; then
    job=$(head -1 "$QUEUE" 2>/dev/null || true)
    if [ -z "${job:-}" ]; then echo "$(date -u) queue empty, exiting" >> "$LOG"; exit 0; fi
    sed -i '1d' "$QUEUE"
    echo "=== $(date -u) CLEAN ($line), firing: $job" >> "$LOG"
    bash -c "$job" >> "$LOG" 2>&1
    echo "=== $(date -u) job finished rc=$?" >> "$LOG"
  else
    sleep 90
  fi
done
