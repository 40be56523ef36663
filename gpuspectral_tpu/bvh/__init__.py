from .build import build_bvh, BVH, morton_codes  # noqa: F401
