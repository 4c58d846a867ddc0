#!/bin/bash
# Reliable TPU health probe for this machine (see memory: block_until_ready
# lies; value transfer is the only real sync; output via file, not pipes).
#
# NEVER kills the probe child: a killed TPU client (SIGKILL, or SIGTERM
# mid-compile — what `timeout` sends) is THE axon-tunnel wedge trigger,
# so a timing-out probe under `timeout` EXTENDED every wedge it measured
# (round-5 post-mortem).  On deadline the child is left to finish on its
# own (it exits cleanly whenever the tunnel recovers) and we report
# wedged-or-slow.  A pidfile keeps retry loops from stacking orphan
# clients: while one abandoned probe is still in flight, new
# invocations report wedged without spawning another.
PIDFILE=/tmp/stvd_tpu_probe.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "wedged-or-slow"   # previous probe still in flight
  exit 1
fi
OUT=$(mktemp)
# reuse the persistent compile cache (same as bench.probe_device): a cold
# compile of even this trivial program can take 2-3 min through the relay
# and read as a false wedge (battery r5a attempt 1 lost 10 min to this)
CACHE="${STVD_CACHE_DIR:-/tmp/jax_cache}"
python -c "
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '$CACHE')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
print(float(jax.jit(lambda x: x.sum())(jnp.ones((8,)))), 'TPU OK')" > "$OUT" 2>&1 &
PID=$!
echo "$PID" > "$PIDFILE"
DEADLINE="${1:-115}"
for i in $(seq 1 "$DEADLINE"); do
  kill -0 "$PID" 2>/dev/null || break   # -0 = existence check, no signal
  sleep 1
done
if grep -q "TPU OK" "$OUT"; then
  rm -f "$PIDFILE"
  echo "healthy"
  exit 0
fi
echo "wedged-or-slow"
exit 1
