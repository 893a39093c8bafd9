from dge_tpu.ops.render import RenderOut, render, render_weights

__all__ = ["RenderOut", "render", "render_weights"]
