from . import client, command, monitor, store  # noqa: F401
