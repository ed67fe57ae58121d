#!/bin/bash
# Wave 12 (round 4): final-state measurements on the shipped defaults
# (pair_coef_basis=efg with the 3-op broadcast-row fill + CPH on).
#  1. reconcile on defaults -- confirms the optimized fill preserves the
#     669-real result (its op order differs from the 6-op fill wave 11
#     gated; endpoint exactness is algebraic, but re-measure anyway).
#  2. step defaults vs TPUHC_PAIR_BASIS=abc anchor (same session):
#     quantifies the optimized fill's residual cost.
#  3. bench on defaults = the BENCH_r04 expectation.
LOG=/tmp/campaign12.log
SNAP=/tmp/tpuhc_c12
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
echo "=== campaign(v12) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== reconcile defaults (efg 3-op fill + CPH) $(date)" >> $LOG
timeout 7200 python tools/reconcile_stats.py >> $LOG 2>&1
probe
echo "=== step defaults (tile=128) $(date)" >> $LOG
TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py step >> $LOG 2>&1
probe
echo "=== step abc anchor (tile=128) $(date)" >> $LOG
TPUHC_PAIR_BASIS=abc TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py step >> $LOG 2>&1
probe
echo "=== bench defaults $(date)" >> $LOG
TPUHC_BENCH_PATIENCE_S=7200 timeout 9000 python bench.py >> $LOG 2>&1
echo "=== campaign(v12) done $(date)" >> $LOG
touch /tmp/campaign12.done
