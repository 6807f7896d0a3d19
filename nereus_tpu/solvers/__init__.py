from .wcsph import wcsph_step  # noqa: F401
from .iisph import iisph_step  # noqa: F401
from .pcisph import (pcisph_step, pcisph_delta,  # noqa: F401
                     pcisph_delta_from_denom, pcisph_grad_denom)
