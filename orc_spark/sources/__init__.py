from . import tokens  # noqa: F401
