#!/bin/bash
# Local edit recipe (reference: script/local_editing/dozer_green.sh):
# color-only edit — near-zero geometry LRs, color scaler 1
python launch.py --config configs/dge.yaml --train \
  --gs_source "$1" --source "$2" \
  system.prompt="turn the dozer into green" \
  system.seg_prompt="dozer" \
  system.segmentor=precomputed \
  system.mask_dir="$3" \
  system.edit.max_steps=1000 \
  system.edit.mask_thres=0.6 \
  system.guidance.guidance_scale=7.5 \
  system.edit.gs_lr_scaler=0.0001 \
  system.edit.gs_final_lr_scaler=0.0001 \
  system.edit.color_lr_scaler=1 \
  system.edit.opacity_lr_scaler=0.0001 \
  system.edit.scaling_lr_scaler=0.0001 \
  system.edit.rotation_lr_scaler=0.0001
