#!/bin/sh
# Record QUALITY.json on the real TPU: the acceptance runs that feed
# tests/test_quality_gates.py.  Sequential (one chip).  ~40-60 min total.
set -x
cd /root/repo
mkdir -p output/qlog
python -u -m nice_slam_tpu.tools.selfcheck --record QUALITY.json \
    --out output/selfcheck_tracked > output/qlog/tracked.log 2>&1
python -u -m nice_slam_tpu.tools.selfcheck --frames 150 --orbit_radians 6.283 \
    --gt_camera --record QUALITY.json \
    --out output/selfcheck_tour > output/qlog/gt_tour.log 2>&1
python -u -m nice_slam_tpu.tools.selfcheck --frames 150 --orbit_radians 6.283 \
    --gt_camera --no_pretrain --record QUALITY.json \
    --out output/selfcheck_tour_scratch > output/qlog/gt_tour_scratch.log 2>&1
python -u -m nice_slam_tpu.tools.selfcheck --frames 150 --orbit_radians 6.283 \
    --gt_camera --imap --record QUALITY.json \
    --out output/selfcheck_imap > output/qlog/imap.log 2>&1
python -u -m nice_slam_tpu.tools.track_envelope --record QUALITY.json \
    > output/qlog/envelope.log 2>&1
echo DONE_ALL
