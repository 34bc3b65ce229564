from .render import render_rays, RenderInputs

__all__ = ["render_rays", "RenderInputs"]
