from nerf_tpu.render.renderer import (
    RenderSettings,
    RenderOutput,
    render_rays,
    render_image,
)

__all__ = ["RenderSettings", "RenderOutput", "render_rays", "render_image"]
