#!/bin/bash
# TUM RGB-D sequences used by the configs (fr1_desk, fr2_xyz, fr3_office)
set -e
mkdir -p datasets/tum && cd datasets/tum
for seq in rgbd_dataset_freiburg1_desk rgbd_dataset_freiburg2_xyz \
           rgbd_dataset_freiburg3_long_office_household; do
  wget https://cvg.cit.tum.de/rgbd/dataset/$(echo $seq | sed -E 's/rgbd_dataset_(freiburg[0-9]).*/\1/')/$seq.tgz
  tar -xzf $seq.tgz && rm $seq.tgz
done
