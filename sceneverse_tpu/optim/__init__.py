from sceneverse_tpu.optim.build import build_optim  # noqa: F401
