#!/bin/bash
# Round-3 TPU measurement campaign v5: probe until the tunnel revives,
# then batch ALL measurements in sequence, logging incrementally.
# Decisive data first: full-step A/B of the three evaluator structures,
# then the grid-parallel lever, then per-phase diagnosis, then the
# convergence-stat gates, then bench, then the accuracy sweep.
LOG=/tmp/campaign5.log
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
echo "=== campaign(v5) start $(date)" >> $LOG

while true; do
  if timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
print('alive', np.asarray(jnp.ones((8,8)).sum()))
" >> $LOG 2>&1; then break; fi
  echo "probe failed $(date)" >> $LOG
  sleep 120
done
echo "=== TPU ALIVE $(date)" >> $LOG

for S in classic gathered merged; do
  echo "=== step $S tile=128 $(date)" >> $LOG
  TPUHC_TILE=128 timeout 3600 python tools/microbench_fused.py --$S eval evsolve step >> $LOG 2>&1
done
for S in classic merged; do
  echo "=== step $S tile=128 GRID_PARALLEL=1 $(date)" >> $LOG
  TPUHC_GRID_PARALLEL=1 TPUHC_TILE=128 timeout 3600 \
    python tools/microbench_fused.py --$S step >> $LOG 2>&1
done
echo "=== phases tile=128 $(date)" >> $LOG
TPUHC_TILE=128 timeout 3600 python tools/microbench_fused.py \
  evals evalg evalm evalk evalf >> $LOG 2>&1
for S in classic gathered merged; do
  echo "=== reconcile_stats $S $(date)" >> $LOG
  TPUHC_EVAL_STRUCTURE=$S timeout 5400 python tools/reconcile_stats.py >> $LOG 2>&1
done
for S in classic gathered merged; do
  echo "=== bench $S $(date)" >> $LOG
  TPUHC_EVAL_STRUCTURE=$S TPUHC_BENCH_PATIENCE_S=3600 timeout 5400 \
    python bench.py >> $LOG 2>&1
done
echo "=== bench classic GRID_PARALLEL=1 $(date)" >> $LOG
TPUHC_GRID_PARALLEL=1 TPUHC_BENCH_PATIENCE_S=3600 timeout 5400 \
  python bench.py >> $LOG 2>&1
echo "=== accuracy_sweep $(date)" >> $LOG
timeout 10800 python tools/accuracy_sweep.py >> $LOG 2>&1
echo "=== campaign done $(date)" >> $LOG
touch /tmp/campaign5.done
