from .render import Camera, render_frame, render_trajectory

__all__ = ["Camera", "render_frame", "render_trajectory"]
