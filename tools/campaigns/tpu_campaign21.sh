#!/bin/bash
# Wave 21 (round 5): round-latency abort_chunk retune + final phase
# anchor.  abort_chunk=4 was tuned in round 2 (115 vs 139 ms at 8)
# when the kernel was ~40% slower per path; the ~24 ms tunnelled d2h
# read per chunk is constant, so the faster split3k kernel shifts the
# optimum toward larger chunks.  The accuracy sweep IS the round-
# latency workload (run_round abort over 100 views), so its
# wall-to-pose distribution adjudicates: interleaved A/B/A/B of
# chunk 4 (default) vs chunk 8.  Then one microbench step phase at the
# FINAL shipped defaults (grid-parallel on, CPH off) for the roofline
# anchor.
LOG=/tmp/campaign21.log
SNAP=/tmp/tpuhc_c21
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
echo "=== campaign(v21) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== (a1) accuracy sweep, abort_chunk=4 (default) $(date)" >> $LOG
timeout 10800 python tools/accuracy_sweep.py --retries 0 --exhaustive 0 >> $LOG 2>&1
probe
echo "=== (b1) accuracy sweep, abort_chunk=8 $(date)" >> $LOG
TPUHC_ABORT_CHUNK=8 timeout 10800 python tools/accuracy_sweep.py --retries 0 --exhaustive 0 >> $LOG 2>&1
probe
echo "=== (a2) accuracy sweep, abort_chunk=4 $(date)" >> $LOG
timeout 10800 python tools/accuracy_sweep.py --retries 0 --exhaustive 0 >> $LOG 2>&1
probe
echo "=== (b2) accuracy sweep, abort_chunk=8 $(date)" >> $LOG
TPUHC_ABORT_CHUNK=8 timeout 10800 python tools/accuracy_sweep.py --retries 0 --exhaustive 0 >> $LOG 2>&1
probe
echo "=== (c) microbench step at final defaults $(date)" >> $LOG
TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py step >> $LOG 2>&1
echo "=== campaign(v21) done $(date)" >> $LOG
touch /tmp/campaign21.done
