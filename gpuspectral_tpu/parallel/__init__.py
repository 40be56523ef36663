from .dist import make_mesh, render_image_sharded, grad_step_sharded  # noqa: F401
