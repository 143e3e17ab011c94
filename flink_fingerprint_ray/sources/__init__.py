from .epochs import EpochSource  # noqa: F401
