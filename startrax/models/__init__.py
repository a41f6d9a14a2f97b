from . import fields, star, nerf_time, mip  # noqa: F401
