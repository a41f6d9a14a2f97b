from . import synthetic, carla, blender, transforms, prefetch  # noqa: F401
