from active_tracking_rl_tpu.models.dueling import DuelingModel, build_model  # noqa: F401
