#!/bin/bash
while kill -0 6334 2>/dev/null; do sleep 30; done
bash /root/repo/results_r4/run_queue2.sh
