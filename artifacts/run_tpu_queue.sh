#!/bin/bash
# Round-5 TPU queue: run every queued on-chip measurement in priority order
# the moment the axon tunnel is up. Each step is timeout-bounded, logged, and
# skipped if its done-marker exists, so the script is safe to re-run across
# tunnel flaps (it makes progress on every up-window).
#
# Usage: bash artifacts/run_tpu_queue.sh
# Markers live in artifacts/tpu_queue_done/.

set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/tpu_queue_done
LOG=artifacts/tpu_queue.log
# One queue pass at a time: two concurrent passes would share the single
# chip and corrupt every timing.
exec 9>artifacts/tpu_queue_done/.lock
if ! flock -n 9; then
  echo "another queue pass holds the lock; exiting $(date -u +%FT%TZ)" >> "$LOG"
  exit 4
fi
mark() { touch "artifacts/tpu_queue_done/$1"; }
done_p() { [ -f "artifacts/tpu_queue_done/$1" ]; }

echo "=== tpu queue run $(date -u +%FT%TZ) ===" >> "$LOG"

probe() {
  timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

if ! probe; then
  echo "tunnel down at start; aborting this attempt $(date -u +%FT%TZ)" >> "$LOG"
  exit 3
fi
echo "tunnel up; starting queue $(date -u +%FT%TZ)" >> "$LOG"

# 1. The official round-5 headline artifact (accuracy gates + precision
#    gates + regression guard). Highest priority: this is the record.
#    bench.py exits rc 0 even on outage (the DRIVER needs a parseable line
#    whatever happens), so rc alone must not set the done-marker: a mid-run
#    flap would permanently publish the failed attempt. Only a record with
#    no "error" lines counts as captured; failed attempts are kept aside
#    and retried on the next up-window.
if ! done_p bench_all; then
  if timeout 3500 python bench.py --all > artifacts/bench_r5_final_all.jsonl.tmp 2>> "$LOG"; then
    if grep -q '"error"' artifacts/bench_r5_final_all.jsonl.tmp; then
      cp artifacts/bench_r5_final_all.jsonl.tmp artifacts/bench_r5_last_error.jsonl
      echo "bench_all rc=0 but error lines present; will retry $(date -u +%FT%TZ)" >> "$LOG"
    else
      mv artifacts/bench_r5_final_all.jsonl.tmp artifacts/bench_r5_final_all.jsonl
      mark bench_all && echo "bench_all DONE $(date -u +%FT%TZ)" >> "$LOG"
    fi
  else
    echo "bench_all FAILED rc=$? $(date -u +%FT%TZ)" >> "$LOG"
  fi
fi

# 2. Infomax past the perfect-memory wall (VERDICT r4 item 2). Cells append
#    to artifacts/biglib_infomax.jsonl one at a time, so partial progress
#    survives a flap; run the cheap cells first.
if ! done_p biglib_16k; then
  timeout 2400 python artifacts/biglib_infomax.py 16000 >> "$LOG" 2>&1 \
    && mark biglib_16k && echo "biglib_16k DONE" >> "$LOG" \
    || echo "biglib_16k FAILED rc=$?" >> "$LOG"
fi
if ! done_p biglib_64k; then
  timeout 3600 python artifacts/biglib_infomax.py 64000 >> "$LOG" 2>&1 \
    && mark biglib_64k && echo "biglib_64k DONE" >> "$LOG" \
    || echo "biglib_64k FAILED rc=$?" >> "$LOG"
fi
if ! done_p biglib_128k; then
  timeout 4800 python artifacts/biglib_infomax.py 128000 >> "$LOG" 2>&1 \
    && mark biglib_128k && echo "biglib_128k DONE" >> "$LOG" \
    || echo "biglib_128k FAILED rc=$?" >> "$LOG"
fi

# 3. NCC small-sensor impl ordering (ADVICE r4 / config.choose_fam_impl).
if ! done_p ncc_small; then
  timeout 2400 python artifacts/ncc_small_sensor.py >> "$LOG" 2>&1 \
    && mark ncc_small && echo "ncc_small DONE" >> "$LOG" \
    || echo "ncc_small FAILED rc=$?" >> "$LOG"
fi

# 4. 32k cell of biglib_infomax (cheaper than 64k/128k but the 16k+64k pair
#    already brackets the 48k wall; run it if time remains).
if ! done_p biglib_32k; then
  timeout 3000 python artifacts/biglib_infomax.py 32000 >> "$LOG" 2>&1 \
    && mark biglib_32k && echo "biglib_32k DONE" >> "$LOG" \
    || echo "biglib_32k FAILED rc=$?" >> "$LOG"
fi

echo "=== queue pass complete $(date -u +%FT%TZ) ===" >> "$LOG"
ls artifacts/tpu_queue_done >> "$LOG"
