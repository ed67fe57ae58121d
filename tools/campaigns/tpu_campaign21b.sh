#!/bin/bash
# Wave 21b (round 5): extend the abort_chunk retune upward.  Wave 21
# read chunk=8 decisively over 4 (median 176 vs 203 ms, p90 460 vs
# 1650, both interleaved reps) -- probe 12 and 16 with interleaved 8
# anchors to find where the trend turns (larger chunks track more
# excess hypotheses per abort; the reference's committed sample had the
# same trade in block-serialization form, ...TrunRANSAC.cu:152).
LOG=/tmp/campaign21b.log
SNAP=/tmp/tpuhc_c21b
set -u
while [ ! -f /tmp/campaign22.done ]; do sleep 60; done
rm -rf $SNAP && mkdir -p $SNAP
git -C /root/repo archive HEAD | tar -x -C $SNAP
cd $SNAP
export PYTHONPATH=/root/.axon_site:$SNAP
probe() {
  until timeout 240 python -c "import jax, jax.numpy as jnp, numpy as np; np.asarray(jnp.ones((8,8)).sum())" >/dev/null 2>&1; do
    echo "probe: tunnel down $(date)" >> $LOG; sleep 120
  done
}
echo "=== campaign(v21b) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
for rep in 1 2; do
  for CH in 8 12 16; do
    probe
    echo "=== sweep abort_chunk=$CH (rep $rep) $(date)" >> $LOG
    TPUHC_ABORT_CHUNK=$CH timeout 10800 python tools/accuracy_sweep.py --retries 0 --exhaustive 0 >> $LOG 2>&1
  done
done
echo "=== campaign(v21b) done $(date)" >> $LOG
touch /tmp/campaign21b.done
