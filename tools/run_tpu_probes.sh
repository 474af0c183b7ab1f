#!/bin/bash
# Run the queued TPU experiments in order, one process each (the chip is
# exclusive per process; sequential by design). Each step is preceded by
# a wedge probe so a mid-battery tunnel failure skips cleanly instead of
# hanging. Logs land in tools/logs/.
#
#   bash tools/run_tpu_probes.sh
#
# Order: cheap + proven shapes first, unproven Mosaic shapes last (a
# silent compiler hang only costs the tail).
set -u
cd /root/repo
mkdir -p tools/logs

probe() {
  python -c "import bench,sys; sys.exit(0 if bench._device_probe_ok(timeout_s=150) else 1)" 2>/dev/null
}

run() { # name cmd...
  local name=$1; shift
  if ! probe; then
    echo "[$name] SKIPPED — tunnel down $(date +%H:%M:%S)" | tee -a tools/logs/battery.log
    return 1
  fi
  echo "[$name] start $(date +%H:%M:%S)" | tee -a tools/logs/battery.log
  "$@" > "tools/logs/$name.log" 2>&1
  echo "[$name] rc=$? end $(date +%H:%M:%S)" | tee -a tools/logs/battery.log
}

run phase_split   python tools/exp_phase_split.py
run serving_prec  python tools/exp_serving_precision.py
run errmap_ab     python tools/exp_errmap_ab.py
run radix_tn1024  python tools/exp_radix_tn.py 1024
run radix_tn2048  python tools/exp_radix_tn.py 2048
run radix_tn4096  python tools/exp_radix_tn.py 4096
run hostbin_ab    python tools/exp_serving_hostbin.py
run adjudicate    python tools/exp_round5_adjudicate.py
run serve_pipe    python tools/exp_serving_pipeline.py
run upload_rate   python tools/exp_upload_rate2.py
run int8_dot      python tools/exp_int8_dot_probe.py
run bench         python bench.py
echo "battery done $(date +%H:%M:%S)" | tee -a tools/logs/battery.log
