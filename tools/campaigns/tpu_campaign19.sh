#!/bin/bash
# Wave 19 (round 5): final-round serving distribution + tile-padding pin.
# (a) FULL 100-view stream-abort run at shipped defaults (chunk=8) --
#     upgrades the 12-view 9.32 views/s headline to a distribution-grade
#     claim over the whole dataset (the CLI prints per-view found/within
#     counts; every GT-recoverable view must stay recovered);
# (b) stream chunk 6 / 12 probes (12 views each) -- bracket the chunk=8
#     optimum more finely than 18d's 4/8/16 sweep;
# (c) TPUHC_TILE=64 bench probe next to an interleaved defaults arm --
#     pin the lane-padding prediction (paths ride the lane axis; Mosaic
#     pads vregs to 128 lanes, so 64-path tiles should cost ~2x/path)
#     with a measurement instead of an assumption.
LOG=/tmp/campaign19.log
SNAP=/tmp/tpuhc_c19
set -u
while [ ! -f /tmp/campaign18e.done ]; do sleep 60; done
rm -rf $SNAP && mkdir -p $SNAP
git -C /root/repo archive HEAD | tar -x -C $SNAP
cd $SNAP
export PYTHONPATH=/root/.axon_site:$SNAP
probe() {
  until timeout 240 python -c "import jax, jax.numpy as jnp, numpy as np; np.asarray(jnp.ones((8,8)).sum())" >/dev/null 2>&1; do
    echo "probe: tunnel down $(date)" >> $LOG; sleep 120
  done
}
echo "=== campaign(v19) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== (a) abort stream, defaults (chunk=8), 100 views $(date)" >> $LOG
timeout 14400 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --stream --abort --views 100 --hypotheses 100 >> $LOG 2>&1
probe
echo "=== (b1) abort stream, chunk=6, 12 views $(date)" >> $LOG
TPUHC_STREAM_CHUNK=6 timeout 10800 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --stream --abort --views 12 --hypotheses 100 >> $LOG 2>&1
probe
echo "=== (b2) abort stream, chunk=12, 12 views $(date)" >> $LOG
TPUHC_STREAM_CHUNK=12 timeout 10800 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --stream --abort --views 12 --hypotheses 100 >> $LOG 2>&1
probe
echo "=== (c1) bench defaults anchor $(date)" >> $LOG
timeout 7200 python bench.py >> $LOG 2>&1
probe
echo "=== (c2) bench TPUHC_TILE=64 probe $(date)" >> $LOG
TPUHC_TILE=64 timeout 7200 python bench.py >> $LOG 2>&1
echo "=== campaign(v19) done $(date)" >> $LOG
touch /tmp/campaign19.done
