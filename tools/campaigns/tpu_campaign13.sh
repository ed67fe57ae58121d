#!/bin/bash
# Wave 13 (round 4): split3k adoption gates + tile retune on the shipped
# defaults.  Adoption rule: evalsk < evals AND step split3k < step
# default AND reconcile conv/real/inf stats held.
LOG=/tmp/campaign13.log
SNAP=/tmp/tpuhc_c13
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
while [ ! -f /tmp/campaign12.done ]; do sleep 120; done
echo "=== campaign(v13) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== phases evals evalsk (tile=128) $(date)" >> $LOG
TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py evals evalsk >> $LOG 2>&1
probe
echo "=== step split3k (tile=128) $(date)" >> $LOG
TPUHC_EVAL_PRECISION=split3k TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py step >> $LOG 2>&1
probe
echo "=== step default anchor (tile=128) $(date)" >> $LOG
TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py step >> $LOG 2>&1
probe
echo "=== reconcile split3k $(date)" >> $LOG
TPUHC_EVAL_PRECISION=split3k timeout 7200 python tools/reconcile_stats.py >> $LOG 2>&1
probe
echo "=== step defaults tile=256 (retune check) $(date)" >> $LOG
TPUHC_TILE=256 timeout 7200 python tools/microbench_fused.py step >> $LOG 2>&1
probe
echo "=== bench split3k $(date)" >> $LOG
TPUHC_EVAL_PRECISION=split3k TPUHC_BENCH_PATIENCE_S=7200 timeout 9000 python bench.py >> $LOG 2>&1
echo "=== campaign(v13) done $(date)" >> $LOG
touch /tmp/campaign13.done
