#!/bin/bash
# Global edit recipe (reference analog: /root/reference/script/vampire.sh)
python launch.py --config configs/dge.yaml --train \
  --gs_source "$1" --source "$2" \
  system.prompt="Turn his face into vampire" \
  system.guidance.guidance_scale=10 \
  system.edit.max_steps=1500
