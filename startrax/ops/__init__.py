from . import lie, rays, sampling, encoding, compositing, losses  # noqa: F401
