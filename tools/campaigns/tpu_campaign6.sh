#!/bin/bash
# Wave 6: CJR (modified-Newton corrector) on TPU. Waits for campaign5,
# then measures the replay phase, the CJR=2 step A/B (+MCS=4 variant),
# the production-kernel conv stats under CJR=2, and a CJR=2 bench.
# Interpretation: adopt CJR=2 only if step time drops AND the CPU+TPU
# conv gates hold (see /tmp/cjr_ab.log for the CPU gate).
LOG=/tmp/campaign6.log
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
echo "=== campaign(v6) start $(date)" >> $LOG
while [ ! -f /tmp/campaign5.done ]; do sleep 120; done
echo "=== campaign5 done, starting $(date)" >> $LOG

echo "=== phases evsolve replay tile=128 $(date)" >> $LOG
TPUHC_TILE=128 timeout 3600 python tools/microbench_fused.py evsolve replay >> $LOG 2>&1
echo "=== step CJR=2 tile=128 $(date)" >> $LOG
TPUHC_CJR=2 TPUHC_TILE=128 timeout 3600 python tools/microbench_fused.py step >> $LOG 2>&1
echo "=== step CJR=2 MCS=4 tile=128 $(date)" >> $LOG
TPUHC_CJR=2 TPUHC_MCS=4 TPUHC_TILE=128 timeout 3600 python tools/microbench_fused.py step >> $LOG 2>&1
echo "=== reconcile_stats CJR=2 (fused kernel) $(date)" >> $LOG
TPUHC_CJR=2 timeout 5400 python tools/reconcile_stats.py >> $LOG 2>&1
echo "=== bench CJR=2 $(date)" >> $LOG
TPUHC_CJR=2 TPUHC_BENCH_PATIENCE_S=3600 timeout 5400 python bench.py >> $LOG 2>&1
echo "=== campaign done $(date)" >> $LOG
touch /tmp/campaign6.done
