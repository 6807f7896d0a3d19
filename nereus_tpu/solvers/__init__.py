from .wcsph import wcsph_step  # noqa: F401
