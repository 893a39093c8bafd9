"""Training/editing systems: direct 3DGS fitting (fit.py), densification
(densify.py), per-group optimizer (optim.py), the DGE edit system
(edit.py), and guidance (guidance.py)."""
