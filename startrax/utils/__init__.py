from . import config, logging, vis, mesh, profiling  # noqa: F401
