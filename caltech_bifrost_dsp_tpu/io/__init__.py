from . import packets, sink, source  # noqa: F401
