#!/bin/bash
# Round-3 hardware queue: run the real-TPU gates first (CLAUDE.md), then the
# pending A/B experiments, strictly sequentially (never run TPU jobs
# concurrently through the relay). Logs to /tmp/hw_session/<name>.log and
# appends per-step exit codes to /tmp/hw_session/status.txt.
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
run tune_dec_scatter python tools/tune_dec_scatter.py
run tune_enc_checked python tools/tune_enc_checked.py
run tune_enc2 python tools/tune_enc2.py
run tune_dec2 python tools/tune_dec2.py
run tune_sketch python tools/tune_sketch.py
run tune_align python tools/tune_align.py
run vpu_peak python tools/vpu_peak.py
# Fresh full-scale bench of the committed kernels (durable numbers even if
# nobody ships tune winners before the relay drops again); detail JSON goes
# to the log dir, not the repo tree.
TMO=2400 BENCH_DETAIL_PATH="$L/bench_detail.json" run bench_full python bench.py
echo "ALL-DONE $(date +%H:%M:%S)" >> "$L/status.txt"
