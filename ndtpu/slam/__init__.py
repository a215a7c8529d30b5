from ndtpu.slam import odometry  # noqa: F401
