from ndtpu.reference_impl import ndt_numpy  # noqa: F401
