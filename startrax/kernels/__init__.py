from . import fused_mlp, occgrid  # noqa: F401
