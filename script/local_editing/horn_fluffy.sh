#!/bin/bash
# Local edit recipe (reference: script/local_editing/horn_fluffy.sh)
python launch.py --config configs/dge.yaml --train \
  --gs_source "$1" --source "$2" \
  system.prompt="Make the skeleton fluffy" \
  system.seg_prompt="skeleton" \
  system.segmentor=precomputed \
  system.mask_dir="$3" \
  system.edit.max_steps=1500 \
  system.guidance.guidance_scale=15
