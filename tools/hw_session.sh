#!/bin/bash
# Canonical hardware queue: run the real-TPU gates first (CLAUDE.md), then
# the calibration + full bench, strictly sequentially (never run TPU jobs
# concurrently through the relay). Logs to /tmp/hw_session/<name>.log and
# appends per-step exit codes to /tmp/hw_session/status.txt.
#
# One-off tuning A/Bs (tools/tune_*.py) are appended here when pending;
# the r03 batch (dec_scatter/enc_checked/enc2/dec2/sketch/align) and the
# r05 batch (dec_pipe/dec2_rows/search_rot/sort/enc_pipe + probe_mosaic)
# have run — winners are committed, so they are out of the default queue.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
L=/tmp/hw_session
mkdir -p "$L"

run() {
  name=$1
  shift
  echo "=== $name start $(date +%H:%M:%S)" >> "$L/status.txt"
  timeout "${TMO:-1800}" "$@" > "$L/$name.log" 2>&1
  echo "=== $name exit=$? $(date +%H:%M:%S)" >> "$L/status.txt"
}

run smoke python tools/tpu_smoke.py
TMO=3600 run soak python tools/tpu_soak.py --rounds 3
# VPU sustained-rate calibration: compare against the committed
# utils/profiling.VPU_U32_GOPS value and its scope note before changing it
# (the rate is a ceiling only for dependent add/xor/shift/and mixes).
run vpu_peak python tools/vpu_peak.py
# Fresh full-scale bench of the committed kernels (durable numbers even if
# the relay drops again); the repo-tree BENCH_DETAIL.json is refreshed by a
# default-path run, partial runs go to /tmp automatically.
TMO=3600 run bench_full python bench.py
echo "ALL-DONE $(date +%H:%M:%S)" >> "$L/status.txt"
