#!/bin/sh
# Round-3 TPU queue: tracked-ATE seed spread (gate on median), headline
# bench, fresh mapping trace, scatter microphysics.
set -x
cd /root/repo
mkdir -p output/qlog
for s in 0 1 2; do
  python -u -m nice_slam_tpu.tools.selfcheck --seed $s --record QUALITY.json \
      --out output/selfcheck_tracked_s$s > output/qlog/tracked_s$s.log 2>&1
done
python -u bench.py > output/qlog/bench.log 2>&1
python -u scripts/profile_map.py --out /tmp/map_trace > output/qlog/profile_map.log 2>&1
python -u scripts/exp_scatter2.py > output/qlog/exp_scatter2.log 2>&1
echo DONE_QUEUE1
