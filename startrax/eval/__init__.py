from . import image, pose, trajectory, iou, render  # noqa: F401
