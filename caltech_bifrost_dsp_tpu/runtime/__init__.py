from . import arming, ring  # noqa: F401
