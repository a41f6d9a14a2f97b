from . import optim, curriculum, loop, checkpoint  # noqa: F401
