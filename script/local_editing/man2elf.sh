#!/bin/bash
# Local edit recipe (reference: script/local_editing/man2elf.sh)
python launch.py --config configs/dge.yaml --train \
  --gs_source "$1" --source "$2" \
  system.prompt="Turn the head into an elf" \
  system.seg_prompt="head" \
  system.segmentor=precomputed \
  system.mask_dir="$3" \
  system.edit.max_steps=1500 \
  system.edit.mask_thres=0.3 \
  system.guidance.guidance_scale=12.5
