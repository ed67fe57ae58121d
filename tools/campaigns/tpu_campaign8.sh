#!/bin/bash
# Wave 8 (round 4): finish the CJR=2 adoption gates (VERDICT r3 item 1),
# record the serving wall-to-pose distribution over all 100 views
# (item 5), and refresh bench with the self-explaining round_ms field
# (item 6).  Runs from a snapshot of HEAD so /root/repo stays editable
# while the campaign is in flight.
#
# Interpretation / adoption rule for CJR=2 (modified-Newton corrector):
#   adopt as default ONLY if (a) step CJR=2 < step baseline on TPU,
#   (b) reconcile conv stats hold (CPU gate already passed EXACTLY:
#   trun-on conv 429 == baseline), and (c) the accuracy sweep headline
#   (89/100 protocol) holds despite the ~25% candidate-pool drop.
LOG=/tmp/campaign8.log
SNAP=/tmp/tpuhc_c8
set -u
rm -rf $SNAP && mkdir -p $SNAP
git -C /root/repo archive HEAD | tar -x -C $SNAP
cd $SNAP
export PYTHONPATH=/root/.axon_site:$SNAP
probe() {  # wait until the tunnel answers a tiny op (survives wedges)
  until timeout 240 python -c "import jax, jax.numpy as jnp, numpy as np; np.asarray(jnp.ones((8,8)).sum())" >/dev/null 2>&1; do
    echo "probe: tunnel down $(date)" >> $LOG; sleep 120
  done
}
echo "=== campaign(v8) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== phases evsolve replay (tile=128) $(date)" >> $LOG
TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py evsolve replay >> $LOG 2>&1
probe
echo "=== step baseline (tile=128) $(date)" >> $LOG
TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py step >> $LOG 2>&1
probe
echo "=== step CJR=2 (tile=128) $(date)" >> $LOG
TPUHC_CJR=2 TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py step >> $LOG 2>&1
probe
echo "=== reconcile_stats CJR=2 $(date)" >> $LOG
TPUHC_CJR=2 timeout 7200 python tools/reconcile_stats.py >> $LOG 2>&1
probe
echo "=== accuracy_sweep default (serving wall-to-pose distribution) $(date)" >> $LOG
timeout 14400 python tools/accuracy_sweep.py >> $LOG 2>&1
probe
echo "=== accuracy_sweep CJR=2 (adoption gate) $(date)" >> $LOG
TPUHC_CJR=2 timeout 14400 python tools/accuracy_sweep.py >> $LOG 2>&1
probe
echo "=== bench default $(date)" >> $LOG
TPUHC_BENCH_PATIENCE_S=7200 timeout 9000 python bench.py >> $LOG 2>&1
echo "=== campaign(v8) done $(date)" >> $LOG
touch /tmp/campaign8.done
