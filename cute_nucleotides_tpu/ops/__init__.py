from . import spec, oracle  # noqa: F401
