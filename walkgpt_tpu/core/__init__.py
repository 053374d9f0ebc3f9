from . import nn, config  # noqa: F401
