#!/bin/bash
# Safe background launcher (VERDICT r4 item 9). Codifies the NOTES.md
# machine fact that cost round 4 the raw-arm eval: launching as
#   cmd1 && nohup bash script.sh ... & echo $! > pidfile
# backgrounds the WHOLE `cmd1 && nohup ...` compound, so $! is the wrapper
# subshell's PID — `kill $(cat pidfile)` then silently kills nothing and
# the script runs as an unkillable zombie to its deadline.
#
# This script is always itself a standalone statement, `nohup` exec's the
# command directly (no intermediate shell), and the recorded PID is
# verified alive before we report success.
#
# Usage: scripts/launch_bg.sh <pidfile> <logfile> <command> [args...]
#   - refuses to double-launch while the pidfile's process is alive
#   - appends stdout+stderr to <logfile>
# Stop with: kill "$(cat pidfile)"; then verify with `kill -0` until dead.
set -u
PIDFILE=${1:?usage: launch_bg.sh <pidfile> <logfile> <cmd...>}
LOG=${2:?usage: launch_bg.sh <pidfile> <logfile> <cmd...>}
shift 2
[ $# -ge 1 ] || { echo "launch_bg: no command given" >&2; exit 2; }

if [ -f "$PIDFILE" ]; then
  old=$(cat "$PIDFILE" 2>/dev/null)
  if [ -n "$old" ] && kill -0 "$old" 2>/dev/null; then
    echo "launch_bg: already running (pid $old from $PIDFILE)" >&2
    exit 1
  fi
fi

nohup "$@" >> "$LOG" 2>&1 &
pid=$!
echo "$pid" > "$PIDFILE"
# nohup exec's the command, so $pid IS the command's PID (no wrapper shell).
sleep 1
if kill -0 "$pid" 2>/dev/null; then
  echo "launch_bg: started pid $pid ($*) log=$LOG pidfile=$PIDFILE"
else
  wait "$pid"; rc=$?
  rm -f "$PIDFILE"
  echo "launch_bg: command died immediately (rc=$rc) — see $LOG" >&2
  exit 1
fi
