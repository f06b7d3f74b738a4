#!/bin/bash
# wait for the axon tunnel to recover, then run the bench session
for i in $(seq 1 40); do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "tunnel up after $i probes"; break
  fi
  echo "probe $i: tunnel down"; sleep 60
done
exec python scripts/bench_session.py
