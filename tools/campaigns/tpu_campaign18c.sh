#!/bin/bash
# Wave 18c (round 5): engine-level adjudication of CPH / grid-parallel.
# Wave 18b showed the step microbench is not decision-grade this session
# (defaults arm spread 69.2-78.8 us across 3 interleaved runs) while its
# single bench pair read CPH=0 481.11 ms vs defaults 484.30 ms (0.66%,
# within noise).  bench.py is cheap and canonical: interleave 3 reps of
# each arm (defaults / CPH=0 / GRID=1 / CPH=0+GRID=1) and decide on the
# per-arm best round_ms.
LOG=/tmp/campaign18c.log
SNAP=/tmp/tpuhc_c18c
set -u
rm -rf $SNAP && mkdir -p $SNAP
git -C /root/repo archive HEAD | tar -x -C $SNAP
cd $SNAP
export PYTHONPATH=/root/.axon_site:$SNAP
probe() {
  until timeout 240 python -c "import jax, jax.numpy as jnp, numpy as np; np.asarray(jnp.ones((8,8)).sum())" >/dev/null 2>&1; do
    echo "probe: tunnel down $(date)" >> $LOG; sleep 120
  done
}
arm() { # arm <label> [ENV=V ...]
  local label=$1; shift
  probe
  echo "=== bench[$label] $(date)" >> $LOG
  env "$@" timeout 7200 python bench.py >> $LOG 2>&1
}
echo "=== campaign(v18c) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
for rep in 1 2 3; do
  arm defaults_$rep TPUHC_NOOP=1
  arm cph0_$rep     TPUHC_CPH=0
  arm grid1_$rep    TPUHC_GRID_PARALLEL=1
  arm cph0grid1_$rep TPUHC_CPH=0 TPUHC_GRID_PARALLEL=1
done
echo "=== campaign(v18c) done $(date)" >> $LOG
touch /tmp/campaign18c.done
