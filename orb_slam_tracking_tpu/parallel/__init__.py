from .ba_sharded import bundle_adjust_sharded, make_ba_mesh  # noqa: F401
from .matcher_sharded import make_tp_mesh, match_descriptors_tp  # noqa: F401
