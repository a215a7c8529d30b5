from ndtpu.lie import se2  # noqa: F401
