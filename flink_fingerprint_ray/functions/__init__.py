from . import fingerprint, textstats  # noqa: F401
