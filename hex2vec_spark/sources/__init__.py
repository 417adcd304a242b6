from . import iceberg_lite, synth  # noqa: F401
