from . import encode  # noqa: F401
