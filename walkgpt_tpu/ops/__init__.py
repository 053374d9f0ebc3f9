from . import attention, resize  # noqa: F401
