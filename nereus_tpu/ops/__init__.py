from .neighbors import neighbor_reduce  # noqa: F401
