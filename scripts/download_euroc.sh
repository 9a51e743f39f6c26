#!/bin/bash
# EuRoC MAV MH_02 (like reference scripts/download_euroc.sh)
set -e
mkdir -p datasets/euroc && cd datasets/euroc
wget http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset/machine_hall/MH_02_easy/MH_02_easy.zip
mkdir -p MH_02_easy && cd MH_02_easy && unzip ../MH_02_easy.zip && rm ../MH_02_easy.zip
