from ndtpu.graph import factors, solve  # noqa: F401
