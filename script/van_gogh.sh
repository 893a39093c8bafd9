#!/bin/bash
# Global edit: repaint the bear statue in Van Gogh style.
# Reference analog: /root/reference/script/van_gogh.sh
python launch.py --config configs/dge.yaml --train \
  --gs_source "$1" --source "$2" \
  system.prompt="Turn him into a bear in the style of a Van Gogh painting" \
  system.negative_prompt="" \
  system.guidance.guidance_scale=12.5 \
  system.guidance.condition_scale=1.5 \
  system.edit.max_steps=1500
