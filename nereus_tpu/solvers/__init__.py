from .wcsph import wcsph_step  # noqa: F401
from .iisph import iisph_step  # noqa: F401
from .pcisph import pcisph_step, pcisph_delta  # noqa: F401
