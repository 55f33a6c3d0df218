#!/bin/bash
# Download the BAIR robot-pushing dataset (reference: scripts/download_bair.sh)
TARGET_DIR=${1:-datasets/bair_raw}
mkdir -p "$TARGET_DIR"
URL=http://rail.eecs.berkeley.edu/datasets/bair_robot_pushing_dataset_v0.tar
wget -c "$URL" -P "$TARGET_DIR"
tar -xvf "$TARGET_DIR/bair_robot_pushing_dataset_v0.tar" -C "$TARGET_DIR"
echo "Now run: python scripts/convert_bair.py --data_dir $TARGET_DIR"
