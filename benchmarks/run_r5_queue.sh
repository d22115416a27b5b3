#!/bin/bash
# Round-5 TPU experiment queue (run after pallas_conv_band_check.py frees
# the chip).  Each stage in its own process; logs under /tmp/r5_*.log.
set -u
cd "$(dirname "$0")"

echo "=== prof_hexvit ===" | tee /tmp/r5_queue.log
timeout 1800 python prof_hexvit.py > /tmp/r5_prof_hexvit.log 2>&1
echo "prof_hexvit rc=$?" | tee -a /tmp/r5_queue.log

echo "=== hexvit_attn_ab ===" | tee -a /tmp/r5_queue.log
timeout 1800 python hexvit_attn_ab.py > /tmp/r5_attn_ab.log 2>&1
echo "attn_ab rc=$?" | tee -a /tmp/r5_queue.log

echo "=== gb3_repro ===" | tee -a /tmp/r5_queue.log
timeout 2700 python gb3_repro.py > /tmp/r5_gb3.log 2>&1
echo "gb3 rc=$?" | tee -a /tmp/r5_queue.log

echo "=== nhwc_avg_ab ===" | tee -a /tmp/r5_queue.log
timeout 1800 python nhwc_avg_ab.py > /tmp/r5_nhwc.log 2>&1
echo "nhwc rc=$?" | tee -a /tmp/r5_queue.log

echo "=== resample4k battery x2 ===" | tee -a /tmp/r5_queue.log
timeout 1800 python suite.py resample4k > /tmp/r5_resample4k_1.log 2>&1
echo "r4k-1 rc=$?" | tee -a /tmp/r5_queue.log
timeout 1800 python suite.py resample4k > /tmp/r5_resample4k_2.log 2>&1
echo "r4k-2 rc=$?" | tee -a /tmp/r5_queue.log

echo DONE | tee -a /tmp/r5_queue.log
