#!/bin/bash
# Global edit recipe (reference analog: /root/reference/script/man2clown.sh)
python launch.py --config configs/dge.yaml --train \
  --gs_source "$1" --source "$2" \
  system.prompt="Turn him into a clown" \
  system.guidance.guidance_scale=10.5 \
  system.edit.max_steps=1500
