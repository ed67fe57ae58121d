#!/bin/bash
# Wave 18 (round 5): final evidence refresh at the shipped defaults
# (split3k + CPH + EFG, tile=128, segment_steps=8) plus two cheap step
# A/Bs that close the remaining retest debts:
# (a) per-phase microbench anchor -- the round-5 session numbers for the
#     README profile table and roofline (same-session rule);
# (b) step under TPUHC_GRID_PARALLEL=1 -- the campaign-8 rejection
#     (77.45 vs 75.81 us) predates split3k; retest at the new balance;
# (c) step under TPUHC_CPH=0 -- quantifies CPH's win at final defaults
#     (the adoption A/B was measured pre-split3k, 82.30 vs 84.39);
# (d) bench.py canonical throughput;
# (e) reconcile_stats conv/real/inf gate record at HEAD;
# (f) accuracy_sweep 100-view protocol headline + serving distribution.
LOG=/tmp/campaign18.log
SNAP=/tmp/tpuhc_c18
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
echo "=== campaign(v18) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== (a) phase anchor, shipped defaults (tile=128) $(date)" >> $LOG
TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py \
  evalsk evasm elimfam elimtail back evsolve replay step >> $LOG 2>&1
probe
echo "=== (b) step, GRID_PARALLEL=1 (split3k retest) $(date)" >> $LOG
TPUHC_TILE=128 TPUHC_GRID_PARALLEL=1 timeout 3600 python tools/microbench_fused.py step >> $LOG 2>&1
probe
echo "=== (c) step, CPH=0 (handoff win at final defaults) $(date)" >> $LOG
TPUHC_TILE=128 TPUHC_CPH=0 timeout 3600 python tools/microbench_fused.py step >> $LOG 2>&1
probe
echo "=== (d) bench $(date)" >> $LOG
timeout 7200 python bench.py >> $LOG 2>&1
probe
echo "=== (e) reconcile (TrunPaths on + off) $(date)" >> $LOG
timeout 7200 python tools/reconcile_stats.py >> $LOG 2>&1
probe
echo "=== (f) accuracy sweep (100 views, abort serving distribution) $(date)" >> $LOG
timeout 10800 python tools/accuracy_sweep.py >> $LOG 2>&1
echo "=== campaign(v18) done $(date)" >> $LOG
touch /tmp/campaign18.done
