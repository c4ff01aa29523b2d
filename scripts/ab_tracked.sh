#!/bin/sh
# A/B the tracked 30-frame selfcheck: isolate presample-RNG vs quant-upload
# effects on ATE (QUALITY.json recorded 6.891 cm vs r2's 4.35 cm).
set -x
cd /root/repo
mkdir -p output/qlog
NICE_SLAM_TPU_PRESAMPLE=0 NICE_SLAM_TPU_QUANT_UPLOAD=0 \
    python -u -m nice_slam_tpu.tools.selfcheck --out output/ab_p0q0 \
    > output/qlog/ab_p0q0.log 2>&1
NICE_SLAM_TPU_PRESAMPLE=0 NICE_SLAM_TPU_QUANT_UPLOAD=1 \
    python -u -m nice_slam_tpu.tools.selfcheck --out output/ab_p0q1 \
    > output/qlog/ab_p0q1.log 2>&1
NICE_SLAM_TPU_PRESAMPLE=1 NICE_SLAM_TPU_QUANT_UPLOAD=0 \
    python -u -m nice_slam_tpu.tools.selfcheck --out output/ab_p1q0 \
    > output/qlog/ab_p1q0.log 2>&1
echo DONE_AB
