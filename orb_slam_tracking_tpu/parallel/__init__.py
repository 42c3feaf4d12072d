from .ba_sharded import bundle_adjust_sharded, make_ba_mesh  # noqa: F401
