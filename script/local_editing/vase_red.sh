#!/bin/bash
# Local edit recipe (reference: script/local_editing/vase_red.sh; the
# reference script's prompt says "green" — evidently a copy-paste slip, the
# recipe name and intent are red)
python launch.py --config configs/dge.yaml --train \
  --gs_source "$1" --source "$2" \
  system.prompt="turn the vase into red" \
  system.seg_prompt="vase" \
  system.segmentor=precomputed \
  system.mask_dir="$3" \
  system.edit.max_steps=1000 \
  system.edit.mask_thres=0.3 \
  system.guidance.guidance_scale=7.5 \
  system.edit.gs_lr_scaler=0.0001 \
  system.edit.gs_final_lr_scaler=0.0001 \
  system.edit.color_lr_scaler=2 \
  system.edit.opacity_lr_scaler=0.0001 \
  system.edit.scaling_lr_scaler=0.0001 \
  system.edit.rotation_lr_scaler=0.0001
