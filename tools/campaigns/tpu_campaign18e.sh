#!/bin/bash
# Wave 18e (round 5): confirmation at the NEW defaults (CPH off +
# grid-parallel on, flipped on campaign 18c's interleaved bench arms).
# (a) bench x2 at new defaults interleaved with one old-defaults
#     control arm -- the flip must reproduce ~479 vs ~487 ms;
# (b) reconcile at new defaults -- re-records the canonical conv/real/
#     inf row (prior records were measured with CPH=1; CPH=0 is
#     reference semantics so only the record needs refreshing);
# (c) accuracy sweep -- protocol headline (90/100 first round) +
#     serving distribution at the final kernel.
LOG=/tmp/campaign18e.log
SNAP=/tmp/tpuhc_c18e
set -u
while [ ! -f /tmp/campaign18d.done ]; do sleep 60; done
rm -rf $SNAP && mkdir -p $SNAP
git -C /root/repo archive HEAD | tar -x -C $SNAP
cd $SNAP
export PYTHONPATH=/root/.axon_site:$SNAP
probe() {
  until timeout 240 python -c "import jax, jax.numpy as jnp, numpy as np; np.asarray(jnp.ones((8,8)).sum())" >/dev/null 2>&1; do
    echo "probe: tunnel down $(date)" >> $LOG; sleep 120
  done
}
echo "=== campaign(v18e) start $(date) HEAD=$(git -C /root/repo rev-parse --short HEAD)" >> $LOG
probe
echo "=== bench[new_defaults_1] $(date)" >> $LOG
timeout 7200 python bench.py >> $LOG 2>&1
probe
echo "=== bench[old_defaults_control] $(date)" >> $LOG
TPUHC_CPH=1 TPUHC_GRID_PARALLEL=0 timeout 7200 python bench.py >> $LOG 2>&1
probe
echo "=== bench[new_defaults_2] $(date)" >> $LOG
timeout 7200 python bench.py >> $LOG 2>&1
probe
echo "=== reconcile (new defaults) $(date)" >> $LOG
timeout 7200 python tools/reconcile_stats.py >> $LOG 2>&1
probe
echo "=== accuracy sweep (new defaults) $(date)" >> $LOG
timeout 10800 python tools/accuracy_sweep.py >> $LOG 2>&1
echo "=== campaign(v18e) done $(date)" >> $LOG
touch /tmp/campaign18e.done
