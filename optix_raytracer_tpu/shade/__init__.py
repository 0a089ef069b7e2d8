from . import sampling, lights, materials  # noqa: F401
