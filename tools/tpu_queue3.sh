#!/bin/bash
# Round-4 recovery queue: re-runs the two A/Bs whose first launches died
# with their driver session (header-only logs).  Detached via setsid so a
# session crash cannot kill it; one TPU experiment at a time.
cd /root/repo
log=/tmp/tpu_queue3.log
echo "queue3 start $(date)" >> $log
AB=ggroup timeout 2400 python tools/ab_bench.py > /tmp/ab_ggroup_r4.log 2>&1
echo "ggroup rc=$?" >> $log
AB=netflix_dotsplit timeout 2400 python tools/ab_bench.py \
  > /tmp/ab_nf_dotsplit.log 2>&1
echo "nf_dotsplit rc=$?" >> $log
echo "queue3 done $(date)" >> $log
