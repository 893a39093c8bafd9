#!/bin/bash
# Local edit recipe (reference: script/local_editing/horn_diamond.sh)
python launch.py --config configs/dge.yaml --train \
  --gs_source "$1" --source "$2" \
  system.prompt="Turn the skeleton into diamond" \
  system.seg_prompt="skeleton" \
  system.segmentor=precomputed \
  system.mask_dir="$3" \
  system.edit.max_steps=1500 \
  system.guidance.guidance_scale=15
