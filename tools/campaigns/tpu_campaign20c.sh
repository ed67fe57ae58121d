#!/bin/bash
# Wave 20c (round 5): second interleaved 100-view rep of stream chunk
# 8 vs 10 (first rep: wave 20 chunk=8 6.55 views/s, wave 20b chunk=10
# 6.87).  Flip stream_abort_chunk to 10 only if 10 wins both reps on
# the full dataset; 12-view windows favored 8 (7.57 vs 7.42), so a
# split verdict keeps 8.
LOG=/tmp/campaign20c.log
SNAP=/tmp/tpuhc_c20c
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
echo "=== campaign(v20c) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== (a) abort stream, chunk=8, 100 views (rep 2) $(date)" >> $LOG
timeout 14400 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --stream --abort --views 100 --hypotheses 100 >> $LOG 2>&1
probe
echo "=== (b) abort stream, chunk=10, 100 views (rep 2) $(date)" >> $LOG
TPUHC_STREAM_CHUNK=10 timeout 14400 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --stream --abort --views 100 --hypotheses 100 >> $LOG 2>&1
echo "=== campaign(v20c) done $(date)" >> $LOG
touch /tmp/campaign20c.done
