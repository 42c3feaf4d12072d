from .images import load_gray, to_gray  # noqa: F401
