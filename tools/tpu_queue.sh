#!/bin/bash
# Unattended TPU experiment queue: waits for the relay to come back,
# then runs the pending round-3 measurements one at a time.
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
# 1) T=16 quality validation (rate already A/B'd: 0.579 vs 0.345 at T=8)
BENCH_INNER=16 timeout 1700 python bench.py > /tmp/bench_t16b.log 2>&1
echo "t16 rc=$?" >> $log
# 2) implicit tier: XLA base vs fused Pallas (all2d+dot_sum), RMSE-aware
AB=implicit timeout 2400 python tools/ab_bench.py > /tmp/ab_implicit.log 2>&1
echo "implicit rc=$?" >> $log
# 3) single-sweep headline refresh
BENCH_INNER=1 timeout 1700 python bench.py > /tmp/bench_inner1.log 2>&1
echo "inner1 rc=$?" >> $log
# 4) group kernel re-check with true aliasing (diagnostic)
AB=group timeout 1700 python tools/ab_bench.py > /tmp/ab_group4.log 2>&1
echo "group rc=$?" >> $log
# 5) pristine headline re-validation at shipped defaults
timeout 1700 python bench.py > /tmp/bench_final_r3.log 2>&1
echo "final rc=$?" >> $log
echo "queue done $(date)" >> $log
