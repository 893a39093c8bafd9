#!/bin/bash
# Local edit recipe: segmentation-masked Gaussians, near-zero geometry LRs
# so only appearance changes (reference analog:
# /root/reference/script/local_editing/*.sh, e.g. dozer_red.sh with
# gs_lr_scaler=1e-4)
python launch.py --config configs/dge.yaml --train \
  --gs_source "$1" --source "$2" \
  system.prompt="Give him sunglasses" \
  system.seg_prompt="face" \
  system.segmentor=precomputed \
  system.mask_dir="$3" \
  system.edit.mask_thres=0.8 \
  system.edit.gs_lr_scaler=0.0001 \
  system.edit.gs_final_lr_scaler=0.0001 \
  system.edit.scaling_lr_scaler=0.0001 \
  system.edit.rotation_lr_scaler=0.0001
