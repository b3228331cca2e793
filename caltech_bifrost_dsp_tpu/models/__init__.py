from . import xengine  # noqa: F401
