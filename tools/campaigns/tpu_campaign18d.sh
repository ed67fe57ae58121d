#!/bin/bash
# Wave 18d (round 5): stream-abort serving throughput (the new
# engine._run_stream_abort chunk-granular pipeline).
# (a) 12-view abort stream at the default chunk (4 hyps) -- the headline
#     serving number vs the 1.95 views/s non-abort stream;
# (b) chunk sweep 8 / 16 -- the stream-throughput optimum may differ
#     from the single-round-latency optimum the default was tuned for;
# (c) 5-view NON-abort stream -- same-session anchor for the A/B.
# All views recovered must stay within GT tolerance (the CLI prints
# found/within counts; a throughput win that loses poses is a loss).
LOG=/tmp/campaign18d.log
SNAP=/tmp/tpuhc_c18d
set -u
while [ ! -f /tmp/campaign18c.done ]; do sleep 60; done
rm -rf $SNAP && mkdir -p $SNAP
git -C /root/repo archive HEAD | tar -x -C $SNAP
cd $SNAP
export PYTHONPATH=/root/.axon_site:$SNAP
probe() {
  until timeout 240 python -c "import jax, jax.numpy as jnp, numpy as np; np.asarray(jnp.ones((8,8)).sum())" >/dev/null 2>&1; do
    echo "probe: tunnel down $(date)" >> $LOG; sleep 120
  done
}
echo "=== campaign(v18d) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== (a) abort stream, chunk=4 (default), 12 views $(date)" >> $LOG
timeout 10800 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --stream --abort --views 12 --hypotheses 100 >> $LOG 2>&1
probe
echo "=== (b1) abort stream, chunk=8, 12 views $(date)" >> $LOG
TPUHC_ABORT_CHUNK=8 timeout 10800 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --stream --abort --views 12 --hypotheses 100 >> $LOG 2>&1
probe
echo "=== (b2) abort stream, chunk=16, 12 views $(date)" >> $LOG
TPUHC_ABORT_CHUNK=16 timeout 10800 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --stream --abort --views 12 --hypotheses 100 >> $LOG 2>&1
probe
echo "=== (c) non-abort stream anchor, 5 views $(date)" >> $LOG
timeout 7200 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --stream --views 5 --hypotheses 100 >> $LOG 2>&1
echo "=== campaign(v18d) done $(date)" >> $LOG
touch /tmp/campaign18d.done
# NOTE (post-run): this wave swept the stream chunk via TPUHC_ABORT_CHUNK;
# the knob was split afterwards -- the stream pipeline now reads
# RansacConfig.stream_abort_chunk / TPUHC_STREAM_CHUNK (default 8, set
# from this wave's 5.66/9.32/8.48 views/s at 4/8/16).
