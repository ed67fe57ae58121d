#!/bin/bash
# Wave 11 (round 4): TPU adoption gates for the EFG pair-coefficient
# basis (HCConfig.pair_coef_basis) -- the fix for the real-count floor
# (see the EFG commit).  Interpret-mode already validated: kernel real
# counts match the oracle (9/11/12 vs 9/11/11 at 1e-5/3e-5/1e-4, H=1).
#
# Adoption rule: flip default to "efg" if (a) TPU reconcile real counts
# jump toward the oracle's 659 scale with conv/inf stats held within
# session noise, (b) step cost delta is small (the EFG fill is ~2 extra
# vector ops per row), (c) the accuracy-sweep headline holds.
LOG=/tmp/campaign11.log
SNAP=/tmp/tpuhc_c11
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
echo "=== campaign(v11) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== reconcile basis=efg (residue sweep) $(date)" >> $LOG
TPUHC_PAIR_BASIS=efg timeout 7200 python tools/reconcile_stats.py >> $LOG 2>&1
probe
echo "=== step basis=efg (tile=128) $(date)" >> $LOG
TPUHC_PAIR_BASIS=efg TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py step >> $LOG 2>&1
probe
echo "=== step basis=abc anchor (tile=128) $(date)" >> $LOG
TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py step >> $LOG 2>&1
probe
echo "=== accuracy_sweep basis=efg $(date)" >> $LOG
TPUHC_PAIR_BASIS=efg timeout 14400 python tools/accuracy_sweep.py >> $LOG 2>&1
probe
echo "=== bench basis=efg $(date)" >> $LOG
TPUHC_PAIR_BASIS=efg TPUHC_BENCH_PATIENCE_S=7200 timeout 9000 python bench.py >> $LOG 2>&1
echo "=== campaign(v11) done $(date)" >> $LOG
touch /tmp/campaign11.done
