#!/bin/bash
# Second-stage unattended queue: waits for tpu_queue.sh to finish, then
# runs the round-4 serving fast-path A/B and the Netflix-shape resident
# group A/B.
cd /root/repo
log=/tmp/tpu_queue.log
echo "queue2 start $(date)" >> $log
while ! grep -q "queue done" $log 2>/dev/null; do sleep 120; done
set -x
# 7) serving fast path: bf16 scores + packed merge vs exact (interleaved)
BENCH_MODE=serving BENCH_SERVING_MODE=ab timeout 1700 python bench.py \
  > /tmp/bench_serving_ab.log 2>&1
echo "serving_ab rc=$?" >> $log
# 8) serving fast path with 64 rated masked (the steady-state config)
BENCH_MODE=serving BENCH_SERVING_MODE=ab BENCH_RATED_L=64 timeout 1700 \
  python bench.py > /tmp/bench_serving_ab_rated.log 2>&1
echo "serving_ab_rated rc=$?" >> $log
# 9) Netflix rank-128 shape: scanned vs resident group kernel
AB=netflix_group_res timeout 2400 python tools/ab_bench.py \
  > /tmp/ab_nf_group_res.log 2>&1
echo "nf_group_res rc=$?" >> $log
echo "queue2 done $(date)" >> $log
