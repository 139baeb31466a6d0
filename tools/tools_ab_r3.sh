#!/bin/bash
# Round-3 outage-work A/B driver: run when the axon tunnel returns.
# Serializes everything (1-core box). Logs to /tmp/ab_r3.log.
# Covers docs/PERF_NOTES.md items 1 (per-config A/B vs r2), 5 (DECODE_G
# sweep), 6 (decode compile time), and the final-run checklist.
set -u
cd /root/repo
LOG=/tmp/ab_r3.log
: > $LOG
run() { echo "=== $* ===" >> $LOG; timeout 3000 "$@" >> $LOG 2>&1; echo "--- rc=$? ---" >> $LOG; }
# 0. driver entry compile sanity (single chip)
run python -u -c "import __graft_entry__ as g; fn, a = g.entry(); import jax; print(jax.jit(fn).lower(*a).compile() and 'entry compile OK')"
# 1. headline + compile times (B=4096), production knobs
run python -u bench.py
# 2. DECODE_G sweep at the headline batch (PERF_NOTES item 5)
# separate cache dirs: the in-tree .jax_cache had key-collision bugs on
# multi-program runs (tests/conftest.py note); knob sweeps isolate theirs
run env ALACJAX_DECODE_G=16 JAX_COMPILATION_CACHE_DIR=/tmp/jc_g16 python -u bench.py
run env ALACJAX_DECODE_UNROLL=2 JAX_COMPILATION_CACHE_DIR=/tmp/jc_u2 python -u bench.py
# 2b. batch-size probe: B=4096 beat 1024 in r2; test the next doubling
run env JAX_COMPILATION_CACHE_DIR=/tmp/jc_b8192 python -u bench.py 8192 4
# 2c. exhaustive-search throughput (device candidate grid vs the host's
#     5x serial trials; baseline denominator runs exhaustive too)
run env ALACJAX_BENCH_SEARCH=exhaustive JAX_COMPILATION_CACHE_DIR=/tmp/jc_exh python -u bench.py 1024 5
# 3. per-config at both batch points (compare vs r2 BASELINE.md table;
#    pre-outage tree for any regressed config: a20bd59^)
run python -u bench_configs.py 1024 5
run python -u bench_configs.py 512 5
echo DONE >> $LOG
