from . import atrous, flow  # noqa: F401
