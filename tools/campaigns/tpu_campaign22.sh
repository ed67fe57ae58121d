#!/bin/bash
# Wave 22 (round 5): final-HEAD evidence refresh.  The README ablation
# table and non-abort stream anchor were last measured on the round-4
# kernel (campaign 17, pre grid-parallel/CPH flips); re-record both at
# the final shipped kernel, plus one bench rep as the same-session
# anchor.
LOG=/tmp/campaign22.log
SNAP=/tmp/tpuhc_c22
set -u
while [ ! -f /tmp/campaign21.done ]; do sleep 60; done
rm -rf $SNAP && mkdir -p $SNAP
git -C /root/repo archive HEAD | tar -x -C $SNAP
cd $SNAP
export PYTHONPATH=/root/.axon_site:$SNAP
probe() {
  until timeout 240 python -c "import jax, jax.numpy as jnp, numpy as np; np.asarray(jnp.ones((8,8)).sum())" >/dev/null 2>&1; do
    echo "probe: tunnel down $(date)" >> $LOG; sleep 120
  done
}
echo "=== campaign(v22) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== (a) ablation ladder at final HEAD $(date)" >> $LOG
timeout 10800 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --ablation >> $LOG 2>&1
probe
echo "=== (b) non-abort stream anchor, 5 views $(date)" >> $LOG
timeout 7200 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --stream --views 5 --hypotheses 100 >> $LOG 2>&1
probe
echo "=== (c) bench anchor $(date)" >> $LOG
timeout 7200 python bench.py >> $LOG 2>&1
echo "=== campaign(v22) done $(date)" >> $LOG
touch /tmp/campaign22.done
