from . import lie, rays, sampling, encoding, compositing, regularizers, losses  # noqa: F401
