from .vocabulary import (  # noqa: F401
    Vocabulary,
    build_vocabulary,
    build_vocabulary_from_frames,
    load_vocabulary,
    save_vocabulary,
    transform,
)
from .database import KeyframeDatabase  # noqa: F401
