#!/bin/bash
# Round-5 flagship driver: resume Goutsias t=300 from the round-4 checkpoint,
# auto-resuming on worker crash (two of ~six round-4 segments died mid-run —
# VERDICT r4 item 1 mandates resume-on-crash in the driver, not manual restarts).
# Each attempt re-enters from flagship_r04_ckpt.npz (checkpoint_every=10 steps).
cd /root/repo
LOG=flagship_r05.log
echo "=== flagship r05 driver start $(date -u +%FT%TZ) ===" >> "$LOG"
for i in $(seq 1 12); do
  echo "=== attempt $i start $(date -u +%FT%TZ) ===" >> "$LOG"
  timeout 14400 python bench_flagship.py --resume --t 300 >> "$LOG" 2>&1
  rc=$?
  echo "=== attempt $i exit rc=$rc $(date -u +%FT%TZ) ===" >> "$LOG"
  if [ $rc -eq 0 ]; then
    echo "=== flagship complete after $i attempt(s) ===" >> "$LOG"
    exit 0
  fi
  sleep 15
done
echo "=== flagship FAILED after 12 attempts ===" >> "$LOG"
exit 1
