"""Multi-chip execution: device mesh helpers (mesh.py) and view-parallel
sharded training (shard.py).

The reference is single-GPU with unused DDP scaffolding (SURVEY.md §2.6);
here parallelism is first-class: camera views shard across devices, Gaussian
parameter gradients reduce over ICI (psum) — the distributed
bundle-adjustment analog called for by BASELINE.json's north star.
"""
