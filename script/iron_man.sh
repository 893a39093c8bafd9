#!/bin/bash
# Global edit recipe (reference analog: /root/reference/script/iron_man.sh)
python launch.py --config configs/dge.yaml --train \
  --gs_source "$1" --source "$2" \
  system.prompt="Turn him into Iron Man" \
  system.guidance.guidance_scale=10 \
  system.edit.max_steps=1500
