from .vocabulary import Vocabulary, build_vocabulary, transform  # noqa: F401
from .database import KeyframeDatabase  # noqa: F401
