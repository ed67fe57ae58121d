#!/bin/bash
# Wave 20 (round 5): stream-abort reruns after the ragged-tail select
# warmup fix.  Campaign 19 exposed that H % chunk != 0 leaves the tail
# chunk's select program to compile MID-STREAM on the first
# chunk-exhausted view (inside the timed span): at H=100 every chunk in
# {6,8,12,16} has a ragged tail, so 19's 100-view 6.27 views/s and the
# anomalous chunk=12 probe (0.67) both carried a hidden compile stall.
# (a) 100-view run at defaults (chunk=8) -- the canonical full-dataset
#     serving number at the fixed warmup;
# (b) 12-view probes chunk=6 / 10 / 12 -- replace the suspect numbers
#     and bracket the optimum at finer grain.
LOG=/tmp/campaign20.log
SNAP=/tmp/tpuhc_c20
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
echo "=== campaign(v20) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== (a) abort stream, defaults (chunk=8), 100 views $(date)" >> $LOG
timeout 14400 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --stream --abort --views 100 --hypotheses 100 >> $LOG 2>&1
probe
echo "=== (b1) abort stream, chunk=6, 12 views $(date)" >> $LOG
TPUHC_STREAM_CHUNK=6 timeout 10800 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --stream --abort --views 12 --hypotheses 100 >> $LOG 2>&1
probe
echo "=== (b2) abort stream, chunk=10, 12 views $(date)" >> $LOG
TPUHC_STREAM_CHUNK=10 timeout 10800 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --stream --abort --views 12 --hypotheses 100 >> $LOG 2>&1
probe
echo "=== (b3) abort stream, chunk=12, 12 views $(date)" >> $LOG
TPUHC_STREAM_CHUNK=12 timeout 10800 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --stream --abort --views 12 --hypotheses 100 >> $LOG 2>&1
echo "=== campaign(v20) done $(date)" >> $LOG
touch /tmp/campaign20.done
