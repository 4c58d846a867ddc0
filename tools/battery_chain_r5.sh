#!/bin/bash
# Round-5 battery chain: waits for battery r5a (launched separately;
# writes BATTERY_R5A_DONE to its summary) then runs r5b -> r5e -> r5d
# sequentially — ONE JAX process at a time on this 1-core box, no kill
# timeouts (SIGKILL/SIGTERM on a TPU client wedges the axon tunnel).
# Detach with setsid so it survives the driving session.
set -u
cd /root/repo

echo "$(date -u +%H:%M:%S) chain: waiting for r5a" >> /tmp/battery_chain_r5.log
while ! grep -q BATTERY_R5A_DONE /tmp/battery_r5a/summary.txt 2>/dev/null; do
  sleep 120
done
echo "$(date -u +%H:%M:%S) chain: r5a done -> r5b" >> /tmp/battery_chain_r5.log
bash tools/battery_r5b.sh /tmp/battery_r5b
echo "$(date -u +%H:%M:%S) chain: r5b done -> r5e" >> /tmp/battery_chain_r5.log
bash tools/battery_r5e.sh /tmp/battery_r5e
echo "$(date -u +%H:%M:%S) chain: r5e done -> r5d" >> /tmp/battery_chain_r5.log
bash tools/battery_r5d.sh /tmp/battery_r5d
echo "$(date -u +%H:%M:%S) chain: r5d done -> r5f" >> /tmp/battery_chain_r5.log
bash tools/battery_r5f.sh /tmp/battery_r5f
echo "$(date -u +%H:%M:%S) chain: ALL DONE" >> /tmp/battery_chain_r5.log
