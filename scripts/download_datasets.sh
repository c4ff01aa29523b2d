#!/bin/sh
# Dataset fetcher for the TPU-native NICE-SLAM framework.
# Usage: sh scripts/download_datasets.sh [demo|replica|tum|cofusion|apartment|replica_gt_mesh|all]
# Mirrors the reference per-dataset download scripts as one dispatcher.
set -e
target="${1:-demo}"

fetch_demo() {
  mkdir -p Datasets && cd Datasets
  wget https://cvg-data.inf.ethz.ch/nice-slam/data/Demo.zip
  unzip Demo.zip
}

fetch_replica() {
  mkdir -p Datasets && cd Datasets
  wget https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
  unzip Replica.zip
}

fetch_tum() {
  mkdir -p Datasets/TUM_RGBD && cd Datasets/TUM_RGBD
  for seq in freiburg1/rgbd_dataset_freiburg1_desk \
             freiburg2/rgbd_dataset_freiburg2_xyz \
             freiburg3/rgbd_dataset_freiburg3_long_office_household; do
    wget "https://vision.in.tum.de/rgbd/dataset/${seq}.tgz"
    tar -xvzf "$(basename "$seq").tgz"
  done
}

fetch_cofusion() {
  mkdir -p Datasets/CoFusion/room4 && cd Datasets/CoFusion/room4
  wget http://visual.cs.ucl.ac.uk/pubs/cofusion/data/room4-full.tar.gz
  tar -xvzf room4-full.tar.gz
}

fetch_apartment() {
  mkdir -p Datasets && cd Datasets
  wget https://cvg-data.inf.ethz.ch/nice-slam/data/Apartment.zip
  unzip Apartment.zip
}

fetch_replica_gt_mesh() {
  # culled ground-truth meshes used by eval_recon
  wget https://cvg-data.inf.ethz.ch/nice-slam/cull_replica_mesh.zip
  unzip cull_replica_mesh.zip
}

case "$target" in
  demo) fetch_demo ;;
  replica) fetch_replica ;;
  tum) fetch_tum ;;
  cofusion) fetch_cofusion ;;
  apartment) fetch_apartment ;;
  replica_gt_mesh) fetch_replica_gt_mesh ;;
  all) fetch_demo; fetch_replica; fetch_tum; fetch_cofusion; fetch_apartment; fetch_replica_gt_mesh ;;
  *) echo "unknown target: $target"; exit 1 ;;
esac
