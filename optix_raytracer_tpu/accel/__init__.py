from . import geometry, bruteforce  # noqa: F401
