#!/bin/bash
# Wave 14 (round 4): post-split3k-adoption validation + the gathered
# structure's second chance under K-concatenation.
#
# (a) gathered+kconcat A/B: at per-matmul split3 the gathered structure
#     lost to classic (evalg 5.35 vs evals 5.07, campaign 9) because the
#     wider combined gather added a 3x-split call; under split3k every
#     structure pays ONE call per matmul, so gathered's 4 calls/eval vs
#     classic's 5 should now win if the call-count argument holds.
#     Adoption rule: evalgk < evalsk AND step(gathered) < step(defaults)
#     AND reconcile conv/real/inf held.
# (b) shipped-defaults accuracy sweep: split3k became default after the
#     campaign-13 reconcile gate; confirm the 90/100 protocol headline
#     and refresh the serving wall-to-pose distribution.
# (c) bench on shipped defaults = the BENCH_r04 preview.
LOG=/tmp/campaign14.log
SNAP=/tmp/tpuhc_c14
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
echo "=== campaign(v14) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== phases evalsk evalgk (tile=128) $(date)" >> $LOG
TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py evalsk evalgk >> $LOG 2>&1
probe
echo "=== step gathered (split3k default, tile=128) $(date)" >> $LOG
TPUHC_EVAL_STRUCTURE=gathered TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py step >> $LOG 2>&1
probe
echo "=== step defaults anchor (tile=128) $(date)" >> $LOG
TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py step >> $LOG 2>&1
probe
echo "=== reconcile gathered (split3k) $(date)" >> $LOG
TPUHC_EVAL_STRUCTURE=gathered timeout 7200 python tools/reconcile_stats.py >> $LOG 2>&1
probe
echo "=== accuracy_sweep shipped defaults $(date)" >> $LOG
timeout 14400 python tools/accuracy_sweep.py >> $LOG 2>&1
probe
echo "=== bench shipped defaults $(date)" >> $LOG
TPUHC_BENCH_PATIENCE_S=7200 timeout 9000 python bench.py >> $LOG 2>&1
echo "=== campaign(v14) done $(date)" >> $LOG
touch /tmp/campaign14.done
