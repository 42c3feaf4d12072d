from .loop_closing import LoopCloser  # noqa: F401
from .map import SlamMap, empty_map  # noqa: F401
from .tracker import Tracker, TrackState  # noqa: F401
