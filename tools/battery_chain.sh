#!/bin/bash
# Round-3 battery chain orchestrator with the re-wedge-safe probing
# discipline (ROUND3_NOTES "Machine notes", third wedge): each
# tpu_probe attempt SIGTERMs a hung TPU client — itself a wedge
# trigger — so probing every 10 min can re-wedge the tunnel forever.
# This script waits an initial quiet period (zero TPU contact), then
# probes at 30-MINUTE intervals; once healthy it launches the battery
# scripts 10..14 (whose own fast health loops then pass immediately).
set -u
QUIET_S=${1:-0}          # initial zero-contact delay
OUT=/tmp/battery_chain
mkdir -p "$OUT"
cd /root/repo

echo "chain start $(date); quiet ${QUIET_S}s" >> "$OUT/log.txt"
sleep "$QUIET_S"

for i in $(seq 1 48); do   # 48 x 30 min = 24 h cap
  if bash tools/tpu_probe.sh 110 > /dev/null 2>&1; then
    echo "healthy at probe $i ($(date))" >> "$OUT/log.txt"
    break
  fi
  echo "wedged at probe $i ($(date)); sleeping 1800s" >> "$OUT/log.txt"
  sleep 1800
done

nohup bash tools/battery10.sh /tmp/battery10 > /dev/null 2>&1 &
echo $! > /tmp/b10.pid
nohup bash tools/battery11.sh /tmp/battery11 /tmp/battery10/summary.txt > /dev/null 2>&1 &
echo $! > /tmp/b11.pid
nohup bash tools/battery12.sh /tmp/battery12 /tmp/battery11/summary.txt > /dev/null 2>&1 &
echo $! > /tmp/b12.pid
nohup bash tools/battery13.sh /tmp/battery13 /tmp/battery12/summary.txt > /dev/null 2>&1 &
echo $! > /tmp/b13.pid
nohup bash tools/battery14.sh /tmp/battery14 /tmp/battery13/summary.txt > /dev/null 2>&1 &
echo $! > /tmp/b14.pid
nohup bash tools/battery15.sh /tmp/battery15 /tmp/battery14/summary.txt > /dev/null 2>&1 &
echo $! > /tmp/b15.pid
echo "batteries launched ($(date))" >> "$OUT/log.txt"
