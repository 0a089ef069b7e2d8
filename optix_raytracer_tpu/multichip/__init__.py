from . import tiles  # noqa: F401
