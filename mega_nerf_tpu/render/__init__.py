"""Volume rendering engine (L2): fully jitted hierarchical fg/bg renderer."""

from mega_nerf_tpu.render.rendering import RenderSettings, render_rays

__all__ = ["RenderSettings", "render_rays"]
