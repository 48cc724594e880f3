from snuffy_tpu.models.snuffy import MILNet, build_milnet  # noqa: F401
