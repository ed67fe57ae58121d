#!/bin/bash
# Wave 18b (round 5): drift-controlled A/B of the two campaign-18
# surprises.  Wave 18 measured step defaults 75.94 / GRID_PARALLEL=1
# 69.98 / CPH=0 65.00 us/iter/tile in three runs 25 minutes apart --
# either the tunnel chip drifted mid-session or CPH and the sequential
# grid are now LOSSES under the split3k defaults (contradicting
# campaigns 8/9, both measured pre-split3k).  Interleave repeats
# A/B/A/B so drift shows up as within-arm spread, then A/B the full
# bench (engine path, where CPH handoff resets every segment).
LOG=/tmp/campaign18b.log
SNAP=/tmp/tpuhc_c18b
set -u
while [ ! -f /tmp/campaign18.done ]; do sleep 60; done
rm -rf $SNAP && mkdir -p $SNAP
git -C /root/repo archive HEAD | tar -x -C $SNAP
cd $SNAP
export PYTHONPATH=/root/.axon_site:$SNAP
probe() {
  until timeout 240 python -c "import jax, jax.numpy as jnp, numpy as np; np.asarray(jnp.ones((8,8)).sum())" >/dev/null 2>&1; do
    echo "probe: tunnel down $(date)" >> $LOG; sleep 120
  done
}
step() { # step <label> [ENV=V ...]
  local label=$1; shift
  probe
  echo "=== step[$label] $(date)" >> $LOG
  env TPUHC_TILE=128 "$@" timeout 3600 python tools/microbench_fused.py step >> $LOG 2>&1
}
echo "=== campaign(v18b) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
step defaults1
step cph0_1    TPUHC_CPH=0
step defaults2
step cph0_2    TPUHC_CPH=0
step grid1     TPUHC_GRID_PARALLEL=1
step cph0grid1 TPUHC_CPH=0 TPUHC_GRID_PARALLEL=1
step defaults3
probe
echo "=== bench CPH=0 $(date)" >> $LOG
TPUHC_CPH=0 timeout 7200 python bench.py >> $LOG 2>&1
probe
echo "=== bench defaults $(date)" >> $LOG
timeout 7200 python bench.py >> $LOG 2>&1
echo "=== campaign(v18b) done $(date)" >> $LOG
touch /tmp/campaign18b.done
