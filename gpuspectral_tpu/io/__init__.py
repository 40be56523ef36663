from .image import write_png, write_pfm, read_pfm, write_exr, tonemap_aces, gamma_correct  # noqa: F401
