from .extractor import orb_extract  # noqa: F401
