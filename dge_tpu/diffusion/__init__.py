"""Diffusion editing stack: DDIM scheduler (ddim.py), epipolar geometry
(epipolar.py), cross-view attention modes (attention.py), the
InstructPix2Pix pipeline (ip2p.py), and weight conversion (weights.py)."""
