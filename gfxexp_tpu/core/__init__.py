from gfxexp_tpu.core import math as gmath  # noqa: F401
from gfxexp_tpu.core import rng  # noqa: F401
from gfxexp_tpu.core import distributions  # noqa: F401
