#!/bin/bash
# Wave 10 (round 4): isolate WHERE the fused kernel loses "real"
# solutions (VERDICT r3 item 4 follow-through).  tools/f64_reconcile.py
# established that the f32 ORACLE (full partial pivoting, plain f32
# matmuls) counts 659 real at the 1e-4 cliff on the reconcile workload
# -- in line with the reference CPU's 521 -- while the fused kernel
# reports 31.  The reconcile tool now prints the kernel's real-count
# tolerance sweep + max|imag| percentiles, so three runs isolate the
# culprit:
#   1. default (split3 eval, reduced solve)  -- the 31 baseline
#   2. TPUHC_SOLVER=schedule                 -- restricted pivoting, no
#      condensation (same pivot metric; different stage structure)
#   3. TPUHC_EVAL_PRECISION=highest          -- ~6-pass bf16 matmuls vs
#      the 3-term split (evaluation rounding)
# If (3) restores the count, the split3 eval rounding is the residue
# source; if neither does, the restricted-pivot solve family is.
# Afterwards: the ablation-table refresh on the round-4 kernel, and a
# bench with TPUHC_CPH=1 if campaign9's bench did not land.
LOG=/tmp/campaign10.log
SNAP=/tmp/tpuhc_c10
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
while [ ! -f /tmp/campaign9.done ]; do sleep 120; done
echo "=== campaign(v10) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== reconcile default (residue sweep) $(date)" >> $LOG
timeout 7200 python tools/reconcile_stats.py >> $LOG 2>&1
probe
echo "=== reconcile solver=schedule $(date)" >> $LOG
TPUHC_SOLVER=schedule timeout 7200 python tools/reconcile_stats.py >> $LOG 2>&1
probe
echo "=== reconcile eval_precision=highest $(date)" >> $LOG
TPUHC_EVAL_PRECISION=highest timeout 7200 python tools/reconcile_stats.py >> $LOG 2>&1
probe
echo "=== ablation refresh (round-4 kernel) $(date)" >> $LOG
timeout 7200 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --ablation >> $LOG 2>&1
echo "=== campaign(v10) done $(date)" >> $LOG
touch /tmp/campaign10.done
