from paths_tpu.encoders.registry import from_name  # noqa: F401
