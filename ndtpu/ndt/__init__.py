from ndtpu.ndt import grid, match  # noqa: F401
