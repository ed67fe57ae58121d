#!/bin/bash
# Wave 9 (round 4): corrector->predictor factorization handoff (CPH,
# HCConfig.predictor_handoff) adoption gates + the fine-grained phase
# sweep backing the README roofline section (VERDICT r3 items 2/3).
#
# Context from wave 8 (same machine, /tmp/campaign8.log): CJR=2 was
# REJECTED -- step 83.75 vs 83.67 us/iter/tile (the tile-wide corrector
# skip already removes the iteration CJR would replay) and the TPU
# reconcile conv gate degraded (trun-off conv 10437 / inf 7650 vs
# baseline 10659 / 6561).  CPH instead replays into RK stage 1, which
# executes EVERY step; expected saving ~7.5 us/step on handoff steps
# (evsolve 13.62 -> replay 6.14 at tile=128).
#
# Adoption rule for CPH: (a) step CPH=1 < step baseline, (b) reconcile
# conv/inf stats hold (tolerance: the drift stays within the per-session
# noise band of baseline re-measurements AND real/inf do not jump like
# CJR=2's +16% inf), (c) bench improves.
LOG=/tmp/campaign9.log
SNAP=/tmp/tpuhc_c9
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
while [ ! -f /tmp/campaign8.done ]; do sleep 120; done
echo "=== campaign(v9) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== step baseline (tile=128, fresh same-session anchor) $(date)" >> $LOG
TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py step >> $LOG 2>&1
probe
echo "=== step CPH=1 (tile=128) $(date)" >> $LOG
TPUHC_CPH=1 TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py step >> $LOG 2>&1
probe
echo "=== reconcile_stats CPH=1 $(date)" >> $LOG
TPUHC_CPH=1 timeout 7200 python tools/reconcile_stats.py >> $LOG 2>&1
probe
echo "=== reconcile_stats baseline (same-session noise anchor) $(date)" >> $LOG
timeout 7200 python tools/reconcile_stats.py >> $LOG 2>&1
probe
echo "=== fine phase sweep (roofline; tile=128) $(date)" >> $LOG
TPUHC_TILE=128 timeout 10800 python tools/microbench_fused.py \
  fillp mm5 mm5s front evals evalg evrhs eval evasm elim back evsolve replay >> $LOG 2>&1
probe
echo "=== bench CPH=1 $(date)" >> $LOG
TPUHC_CPH=1 TPUHC_BENCH_PATIENCE_S=7200 timeout 9000 python bench.py >> $LOG 2>&1
echo "=== campaign(v9) done $(date)" >> $LOG
touch /tmp/campaign9.done
