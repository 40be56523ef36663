from .dist import make_mesh, render_image_sharded, grad_step_sharded  # noqa: F401
from .launch import initialize, pod_mesh, is_coordinator, gather_image  # noqa: F401
