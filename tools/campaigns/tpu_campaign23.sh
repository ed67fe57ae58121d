#!/bin/bash
# Wave 23 (round 5): the FINAL-defaults evidence set after the round-5
# knob flips (CPH off, parallel grid, stream_abort_chunk=10,
# abort_chunk=12).  (a) full-protocol accuracy sweep (retries +
# exhaustive miss escalation) -- the headline accuracy + serving
# distribution at the shipped config; (b) 100-view stream-abort run --
# the full-dataset serving number at the shipped config; (c) one bench
# rep as the same-session anchor.
LOG=/tmp/campaign23.log
SNAP=/tmp/tpuhc_c23
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
echo "=== campaign(v23) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== (a) full accuracy sweep at final defaults $(date)" >> $LOG
timeout 10800 python tools/accuracy_sweep.py >> $LOG 2>&1
probe
echo "=== (b) abort stream, final defaults, 100 views $(date)" >> $LOG
timeout 14400 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --stream --abort --views 100 --hypotheses 100 >> $LOG 2>&1
probe
echo "=== (c) bench anchor $(date)" >> $LOG
timeout 7200 python bench.py >> $LOG 2>&1
echo "=== campaign(v23) done $(date)" >> $LOG
touch /tmp/campaign23.done
