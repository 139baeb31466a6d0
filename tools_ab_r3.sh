#!/bin/bash
# Round-3 outage-work A/B driver: run when the axon tunnel returns.
# Serializes everything (1-core box). Logs to /tmp/ab_r3.log.
set -u
cd /root/repo
LOG=/tmp/ab_r3.log
: > $LOG
run() { echo "=== $* ===" >> $LOG; timeout 3000 "$@" >> $LOG 2>&1; echo "--- rc=$? ---" >> $LOG; }
# 1. headline + compile times (B=4096)
run python -u bench.py
# 2. per-config at both batch points (compare vs r2 BASELINE.md table)
run python -u bench_configs.py 1024 5
run python -u bench_configs.py 512 5
echo DONE >> $LOG
