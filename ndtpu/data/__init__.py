from ndtpu.data import synth  # noqa: F401
