#!/bin/bash
# Global edit recipe (reference analog: /root/reference/script/fauvism.sh)
python launch.py --config configs/dge.yaml --train \
  --gs_source "$1" --source "$2" \
  system.prompt="Turn it into Fauvism style painting" \
  system.guidance.guidance_scale=12.5 \
  system.edit.max_steps=1500
