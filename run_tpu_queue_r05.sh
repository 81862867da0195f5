#!/bin/bash
# Round-5 TPU bench queue: waits for the flagship driver to finish, then
# runs the measurement set back-to-back (single tunnel client at a time).
cd /root/repo
LOG=tpu_queue_r05.log
echo "=== r05 queue start $(date -u +%FT%TZ) ===" >> "$LOG"
# wait for the flagship driver (bash run_flagship_r05.sh) to exit
while pgrep -f "bash run_flagship_r05.sh" > /dev/null; do
  sleep 30
done
echo "=== flagship driver gone; benches start $(date -u +%FT%TZ) ===" >> "$LOG"
sleep 10

echo "--- bench_pencil $(date -u +%FT%TZ) ---" >> "$LOG"
timeout 1800 python bench_pencil.py >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"

echo "--- bench_e2e toggle f64 $(date -u +%FT%TZ) ---" >> "$LOG"
timeout 5400 python bench_e2e.py toggle --f64-only >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"

echo "--- bench_table_matvec $(date -u +%FT%TZ) ---" >> "$LOG"
timeout 2400 python bench_table_matvec.py >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"

echo "--- bench.py headline $(date -u +%FT%TZ) ---" >> "$LOG"
timeout 1800 python bench.py >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== r05 queue done $(date -u +%FT%TZ) ===" >> "$LOG"
