"""Framework utilities: config (YAML + dotlist), misc (C() schedules, mask
morphology), saving (image/video/json artifacts), checkpoints (orbax)."""
