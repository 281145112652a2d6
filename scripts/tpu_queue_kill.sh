#!/bin/bash
# Cleanly stop a queue script and its process tree WITHOUT pattern-matched
# kills: walks /proc/<pid>/task/*/children from the recorded queue PID and
# kills each specific PID, deepest first.
set -u
PIDFILE=${1:?usage: tpu_queue_kill.sh <pidfile>}
ROOT=$(cat "$PIDFILE")
collect() {
  local p=$1
  for c in $(cat /proc/"$p"/task/*/children 2>/dev/null); do
    collect "$c"
  done
  echo "$p"
}
for p in $(collect "$ROOT"); do
  kill "$p" 2>/dev/null && echo "killed $p"
done
