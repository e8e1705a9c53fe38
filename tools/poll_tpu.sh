#!/bin/sh
# Poll the tunneled TPU until it answers; append timestamps to the log and
# touch /tmp/tpu_alive on success. Each probe is its own short-lived
# process so the device is never held between probes.
LOG=${1:-/tmp/tpu_poll.log}
while true; do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((128, 128))
print('alive:', d[0].platform, float((x @ x)[0, 0]))
" >> "$LOG" 2>&1; then
    touch /tmp/tpu_alive
    echo "$(date -u +%H:%M:%S) TPU ALIVE" >> "$LOG"
    exit 0
  fi
  echo "$(date -u +%H:%M:%S) probe failed" >> "$LOG"
  sleep 240
done
