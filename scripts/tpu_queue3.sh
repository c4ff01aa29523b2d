#!/bin/sh
# Round-3 TPU queue 3 (restart after reboot): the tail of queue1 + queue2.
set -x
cd /root/repo
mkdir -p output/qlog
python -u bench.py > output/qlog/bench.log 2>&1
python -u scripts/profile_map.py --out /tmp/map_trace > output/qlog/profile_map.log 2>&1
python -u scripts/exp_scatter2.py > output/qlog/exp_scatter2.log 2>&1
for kf in 25 10 5; do
  python -u -m nice_slam_tpu.tools.selfcheck --frames 150 --orbit_radians 6.283 \
      --gt_camera --imap --keyframe_every $kf --record QUALITY.json \
      --out output/selfcheck_imap_kf$kf > output/qlog/imap_kf$kf.log 2>&1
done
# A/B: scatter-only coarse dgrad vs the small-V one-hot matmul path
NICE_SLAM_TPU_DGRAD_MATMUL_VMAX=0 python -u bench.py \
    > output/qlog/bench_novmax.log 2>&1
echo DONE_QUEUE3
