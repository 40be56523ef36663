from .path_tracer import render_image, trace_rays, render_sample  # noqa: F401
