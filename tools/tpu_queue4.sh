#!/bin/bash
# Waits for tpu_queue3 (ggroup + nf_dotsplit), then measures the T=16
# lever: rate A/B at the current kernel (dot_sum) and a full bench at
# BENCH_INNER=16 for quality (final_train_rmse vs the T=8 headline).
cd /root/repo
log=/tmp/tpu_queue3.log
while ! grep -q "queue3 done" $log 2>/dev/null; do sleep 60; done
echo "queue4 start $(date)" >> $log
AB=t16 timeout 2400 python tools/ab_bench.py > /tmp/ab_t16_r4.log 2>&1
echo "t16 rc=$?" >> $log
BENCH_INNER=16 BENCH_WATCHDOG=1700 timeout 3600 python bench.py \
  > /tmp/bench_t16_r4.log 2>&1
echo "bench_t16 rc=$?" >> $log
echo "queue4 done $(date)" >> $log
