#!/bin/bash
# Wave 20b (round 5): stream-chunk default adjudication after wave 20.
# Wave 20 (tail-warmup fix, final defaults) read chunk 6/10/12 at
# 6.24/7.42/7.12 views/s over a 12-view window that now contains one
# miss (a marginal view flipped when CPH went off; 18d's all-found
# 9.32 was measured pre-flip, so those arms are not comparable).
# (a) 12-view chunk=8 -- the missing same-session anchor;
# (b) 100-view chunk=10 -- if it beats wave 20's 6.55 at chunk=8,
#     flip stream_abort_chunk's default to 10.
LOG=/tmp/campaign20b.log
SNAP=/tmp/tpuhc_c20b
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
echo "=== campaign(v20b) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== (a) abort stream, chunk=8, 12 views $(date)" >> $LOG
timeout 10800 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --stream --abort --views 12 --hypotheses 100 >> $LOG 2>&1
probe
echo "=== (b) abort stream, chunk=10, 100 views $(date)" >> $LOG
TPUHC_STREAM_CHUNK=10 timeout 14400 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --stream --abort --views 100 --hypotheses 100 >> $LOG 2>&1
echo "=== campaign(v20b) done $(date)" >> $LOG
touch /tmp/campaign20b.done
