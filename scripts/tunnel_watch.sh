#!/bin/bash
# Probe the axon tunnel every ~15 min; on success leave /tmp/TUNNEL_UP
# and stop (so the TPU is not held). Each probe is its own process with
# a hard timeout (backend init hangs in C when the relay is down).
rm -f /tmp/TUNNEL_UP
while true; do
  ts=$(date +%H:%M:%S)
  out=$(timeout 600 python - <<'EOF' 2>&1
import jax, time
t0 = time.time()
d = jax.devices()
import jax.numpy as jnp, numpy as np
x = np.asarray(jnp.ones((8, 128)) + 1.0)
print("OK init+dispatch %.1fs %s" % (time.time() - t0, d))
EOF
)
  rc=$?
  echo "$ts rc=$rc ${out//$'\n'/ | }" >> /tmp/tunnel_watch.log
  if [ $rc -eq 0 ] && [[ "$out" == *OK* ]]; then
    touch /tmp/TUNNEL_UP
    echo "$ts TUNNEL_UP" >> /tmp/tunnel_watch.log
    exit 0
  fi
  sleep 900
done
