#!/bin/bash
# Round-5 second battery chain: r5g (trained natural-EOS decode under
# int8) -> r5h (beam-trap quality cell).  ONE JAX process at a time on
# this 1-core box, no kill timeouts (SIGKILL/SIGTERM on a TPU client
# wedges the axon tunnel).  Detach with setsid.
set -u
cd /root/repo

echo "$(date -u +%H:%M:%S) chain2: r5g" >> /tmp/battery_chain_r5gh.log
bash tools/battery_r5g.sh /tmp/battery_r5g
echo "$(date -u +%H:%M:%S) chain2: r5g done -> r5h" >> /tmp/battery_chain_r5gh.log
bash tools/battery_r5h.sh /tmp/battery_r5h
echo "$(date -u +%H:%M:%S) chain2: ALL DONE" >> /tmp/battery_chain_r5gh.log
