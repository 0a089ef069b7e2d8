from . import device_scene, builtins  # noqa: F401
