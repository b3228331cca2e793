from . import codec, proclog, timeutils  # noqa: F401
