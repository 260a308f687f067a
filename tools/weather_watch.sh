#!/bin/bash
# Probe the host's page-fault path and launch the interleaved scaling
# campaign only when it has recovered. This host (BENCH/HISTORY.md)
# collapses in multi-minute-to-hour windows where first-touch page
# faults run ~100x slow (measured this session: numpy touching 8 GB
# went from 1.8 s/4 GB to >120 s, sys-time-bound) — running the
# campaign inside such a window measures the host, not the engine.
#
# Probe: touch 2 GB at page stride; good window = completes in < 3 s.
# Require 2 consecutive good probes 60 s apart before launching.
cd /root/repo || exit 1
LOG=/tmp/weather_watch.log
PROBE='import numpy, time
t = time.time()
a = numpy.zeros(2 * 1024**3, dtype=numpy.uint8)
a[::4096] = 1
print(round(time.time() - t, 2))'

good_streak=0
while true; do
    secs=$(timeout 30 python3 -c "$PROBE" 2>/dev/null)
    rc=$?
    now=$(date -u +%H:%M:%S)
    if [ "$rc" -eq 0 ] && python3 -c "exit(0 if float('$secs') < 3.0 else 1)" 2>/dev/null; then
        good_streak=$((good_streak + 1))
        echo "$now probe ${secs}s good (streak $good_streak)" >> "$LOG"
    else
        good_streak=0
        echo "$now probe bad (rc=$rc secs=${secs:-timeout})" >> "$LOG"
    fi
    if [ "$good_streak" -ge ${WATCH_STREAK:-2} ]; then
        N=${CAMPAIGN_N:-5}
        echo "$now launching campaign $N" >> "$LOG"
        SCALING_CAMPAIGN_OUT=BENCH/scaling_campaign$N.json \
        SCALING_CONTROL_OUT=BENCH/control_interleaved$N.json \
        SCALING_PAIRS=2:8 SCALING_REPS=${CAMPAIGN_REPS:-6} \
            python tools/run_interleaved_campaign.py \
            > /tmp/campaign$N.out 2> /tmp/campaign$N.log
        echo "$(date -u +%H:%M:%S) campaign $N exited rc=$?" >> "$LOG"
        exit 0
    fi
    sleep 60
done
