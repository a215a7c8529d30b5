from ndtpu.eval import ate  # noqa: F401
