from . import tiles, memory  # noqa: F401
