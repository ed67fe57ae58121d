#!/bin/bash
# Wave 16 (round 4): evidence refresh on the shipped defaults
# (split3k + CPH + EFG, segment_steps=8 confirmed by wave 15).
# (a) full per-phase microbench sweep -- re-ranks the per-step cost
#     slices at the new baseline for the README profile table;
# (b) --ablation ladder rerun -- the README strategy table's measured
#     rungs date from the round-2 kernel;
# (c) --stream serving throughput -- the 1.86 views/s README number
#     predates split3k (stream mode is tracking-bound, so the 13%
#     cheaper step should move it).
LOG=/tmp/campaign16.log
SNAP=/tmp/tpuhc_c16
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
echo "=== campaign(v16) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== full phase sweep, shipped defaults (tile=128) $(date)" >> $LOG
TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py fillp front eval evasm elim elimfam elimtail back evsolve replay step >> $LOG 2>&1
probe
echo "=== ablation ladder (round-4 kernel) $(date)" >> $LOG
timeout 10800 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --ablation --hypotheses 100 >> $LOG 2>&1
probe
echo "=== stream serving (5 views, H=100) $(date)" >> $LOG
timeout 7200 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --stream --views 5 --hypotheses 100 >> $LOG 2>&1
echo "=== campaign(v16) done $(date)" >> $LOG
touch /tmp/campaign16.done
