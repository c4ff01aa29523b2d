#!/bin/sh
# Round-3 TPU queue 2: iMAP* forgetting analysis (keyframe_every sweep,
# VERDICT r2 next #7) + coarse-dgrad matmul A/B on the headline bench.
set -x
cd /root/repo
mkdir -p output/qlog
for kf in 25 10 5; do
  python -u -m nice_slam_tpu.tools.selfcheck --frames 150 --orbit_radians 6.283 \
      --gt_camera --imap --keyframe_every $kf --record QUALITY.json \
      --out output/selfcheck_imap_kf$kf > output/qlog/imap_kf$kf.log 2>&1
done
# A/B: scatter-only coarse dgrad vs the new small-V one-hot matmul path
NICE_SLAM_TPU_DGRAD_MATMUL_VMAX=0 python -u bench.py \
    > output/qlog/bench_novmax.log 2>&1
python -u bench.py > output/qlog/bench_vmax.log 2>&1
echo DONE_QUEUE2
