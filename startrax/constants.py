"""Numerical constants shared across the framework.

Mirrors the eps conventions of the reference (utils/constants.py:3 uses
torch.finfo(torch.float32).eps); compositing uses the same guards so rendered
values match bit-for-bit in f32.
"""

import numpy as np

# float32 machine epsilon — clamp floor for probabilities/entropies.
EPS = float(np.finfo(np.float32).eps)

# Additive guard inside transmittance cumprod (reference rendering__.py:343).
TRANS_EPS = 1e-10

# Guard for disparity maps (reference rendering__.py:356).
DISP_EPS = 1e-10

# Additive guard on PDF weights before normalization (rendering__.py:722).
PDF_EPS = 1e-5
