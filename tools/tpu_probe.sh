#!/bin/bash
# Reliable TPU health probe for this machine (see memory: block_until_ready
# lies; value transfer is the only real sync; output via file, not pipes).
OUT=$(mktemp)
timeout "${1:-115}" python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda x: x.sum())(jnp.ones((8,)))), 'TPU OK')" > "$OUT" 2>&1
if grep -q "TPU OK" "$OUT"; then
  echo "healthy"
  exit 0
fi
echo "wedged-or-slow"
exit 1
