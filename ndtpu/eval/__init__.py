from ndtpu.eval import ate, render  # noqa: F401
