#!/bin/bash
# Replica (nice-slam mirror), like reference scripts/download_replica.sh
set -e
mkdir -p datasets/replica && cd datasets/replica
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
unzip Replica.zip && rm Replica.zip
