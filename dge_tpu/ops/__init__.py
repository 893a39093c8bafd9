"""Rasterization and math ops. Submodules: projection, binning, composite,
render (high-level API), naive (test oracle), sh, losses."""
