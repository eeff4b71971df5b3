#!/bin/bash
# Crash-resilient TPU queue primitives (VERDICT r4 next #7).
#
# Source this from a queue script, then use:
#   qrun <timeout_s> <cmd...>   — run with timeout, log tail, retry ONCE on
#                                 nonzero exit (TPU worker crashes surface as
#                                 JaxRuntimeError → rc!=0; every runner's
#                                 checkpoint/flush-per-model resume makes the
#                                 retry continue, not restart)
#   qmanifest <file...>         — end-of-queue manifest: report each expected
#                                 artifact as PRESENT/MISSING; nonzero exit
#                                 if any is missing
#
# All TPU work must be serialized through one queue: concurrent TPU
# processes crash the worker (memory: axon-tpu-measurement-hazards).
set -u
QLOG=${QLOG:-results/tpu_queue_r5.log}

qlog() { echo "--- $* ($(date +%H:%M:%S))" >> "$QLOG"; }

qrun() {
  local t="$1"; shift
  qlog "$*"
  timeout "$t" "$@" 2>&1 | grep -vE "WARNING:2026|not all JAX" | tail -6 >> "$QLOG"
  local rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    qlog "RETRY (rc=$rc): $*"
    timeout "$t" "$@" 2>&1 | grep -vE "WARNING:2026|not all JAX" | tail -6 >> "$QLOG"
    rc=${PIPESTATUS[0]}
    [ "$rc" -ne 0 ] && qlog "FAILED after retry (rc=$rc): $*"
  fi
  return "$rc"
}

qmanifest() {
  local missing=0
  qlog "MANIFEST"
  for f in "$@"; do
    if [ -e "$f" ]; then
      echo "  PRESENT $f" >> "$QLOG"
    else
      echo "  MISSING $f" >> "$QLOG"
      missing=1
    fi
  done
  return "$missing"
}
