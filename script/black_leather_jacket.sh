#!/bin/bash
# Global edit recipe (reference analog: /root/reference/script/black_leather_jacket.sh)
python launch.py --config configs/dge.yaml --train \
  --gs_source "$1" --source "$2" \
  system.prompt="Give him a black leather jacket" \
  system.guidance.guidance_scale=10 \
  system.edit.max_steps=1500
