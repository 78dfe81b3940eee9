#!/bin/bash
# Unattended TPU experiment queue: waits for the relay to come back,
# then runs the pending measurements one at a time (single chip).
# Round 4 list: the r3 leftovers (T=16 quality, implicit A/B, single
# sweep, pristine headline) plus the new resident group kernel A/Bs.
cd /root/repo
log=/tmp/tpu_queue.log
echo "queue start $(date)" >> $log
# wait for the relay (probe hangs while it is down)
while true; do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "tpu back $(date)" >> $log
    break
  fi
  sleep 120
done
set -x
# 1) resident group kernel vs scanned per-batch (the r4 kernel lever)
AB=group_res timeout 2400 python tools/ab_bench.py > /tmp/ab_group_res.log 2>&1
echo "group_res rc=$?" >> $log
# 2) resident group vs the r3 chunked group (isolates the regression cause)
AB=group_res_vs_chunked timeout 2400 python tools/ab_bench.py > /tmp/ab_group_res_vs.log 2>&1
echo "group_res_vs rc=$?" >> $log
# 3) T=16 quality validation (rate already A/B'd: 0.579 vs 0.345 at T=8)
BENCH_INNER=16 timeout 1700 python bench.py > /tmp/bench_t16b.log 2>&1
echo "t16 rc=$?" >> $log
# 4) implicit tier: XLA base vs fused Pallas (all2d+dot_sum), RMSE-aware
AB=implicit timeout 2400 python tools/ab_bench.py > /tmp/ab_implicit.log 2>&1
echo "implicit rc=$?" >> $log
# 5) single-sweep headline refresh
BENCH_INNER=1 timeout 1700 python bench.py > /tmp/bench_inner1.log 2>&1
echo "inner1 rc=$?" >> $log
# 6) pristine headline re-validation at shipped defaults (BENCH_r04 shape)
timeout 1700 python bench.py > /tmp/bench_final_r4.log 2>&1
echo "final rc=$?" >> $log
echo "queue done $(date)" >> $log
