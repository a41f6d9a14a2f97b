from . import optim, curriculum, loop, checkpoint, diagnostics  # noqa: F401
