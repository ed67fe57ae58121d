#!/bin/bash
# Wave 7b (replaces wave 7 -- rk3/rk2 were REJECTED by the CPU conv
# gate, see /tmp/cjr_ab.log). Waits for campaign6, then runs the two
# remaining items: the CJR=2 accuracy sweep (final adoption gate: the
# 89/100 protocol headline must hold despite the ~25% 'real'-count
# drop) and the round-3-kernel ablation table refresh.
LOG=/tmp/campaign7b.log
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
echo "=== campaign(v7b) start $(date)" >> $LOG
while [ ! -f /tmp/campaign6.done ]; do sleep 120; done
echo "=== campaign6 done, starting $(date)" >> $LOG

echo "=== accuracy_sweep CJR=2 $(date)" >> $LOG
TPUHC_CJR=2 timeout 10800 python tools/accuracy_sweep.py >> $LOG 2>&1
echo "=== ablation refresh (round-3 kernel) $(date)" >> $LOG
timeout 7200 python -m trifocal_pose_estimation_using_improved_gpuhc_tpu.cli \
  -p trifocal_2op1p_30x30 --ablation >> $LOG 2>&1
echo "=== campaign done $(date)" >> $LOG
touch /tmp/campaign7b.done
