#!/bin/bash
# Wave 15 (round 4): (a) split the condensed elimination's cost into
# family stages vs the 14-stage reduced tail (microbench phases
# elimfam/elimtail) to aim the next kernel lever; (b) segment-length
# retune -- the split3k adoption cut per-step cost ~13%, which shifts
# the launch-overhead / pruning-granularity balance that picked
# segment_steps=8.  segment_steps is semantics-invariant (pure
# scheduling), so the retune is a timing-only bench A/B; campaign 14's
# bench is the seg=8 anchor.
LOG=/tmp/campaign15.log
SNAP=/tmp/tpuhc_c15
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
while [ ! -f /tmp/campaign14.done ]; do sleep 120; done
echo "=== campaign(v15) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== phases elim elimfam elimtail evasm (tile=128) $(date)" >> $LOG
TPUHC_TILE=128 timeout 7200 python tools/microbench_fused.py elim elimfam elimtail evasm >> $LOG 2>&1
for SEG in 4 12 16; do
  probe
  echo "=== bench segment_steps=$SEG $(date)" >> $LOG
  TPUHC_SEGMENT_STEPS=$SEG TPUHC_BENCH_PATIENCE_S=7200 timeout 9000 python bench.py >> $LOG 2>&1
done
probe
echo "=== bench segment_steps=8 anchor $(date)" >> $LOG
TPUHC_BENCH_PATIENCE_S=7200 timeout 9000 python bench.py >> $LOG 2>&1
echo "=== campaign(v15) done $(date)" >> $LOG
touch /tmp/campaign15.done
