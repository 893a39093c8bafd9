#!/bin/bash
# Local edit recipe (reference: script/local_editing/horn_fire.sh):
# mild geometry movement allowed (scalers 0.1), full color LR
python launch.py --config configs/dge.yaml --train \
  --gs_source "$1" --source "$2" \
  system.prompt="Make the skeleton on fire" \
  system.seg_prompt="skeleton" \
  system.segmentor=precomputed \
  system.mask_dir="$3" \
  system.edit.max_steps=1500 \
  system.guidance.guidance_scale=15 \
  system.edit.gs_lr_scaler=0.1 \
  system.edit.gs_final_lr_scaler=0.1 \
  system.edit.color_lr_scaler=1 \
  system.edit.opacity_lr_scaler=0.1 \
  system.edit.scaling_lr_scaler=0.1 \
  system.edit.rotation_lr_scaler=0.1
