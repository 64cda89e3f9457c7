from active_tracking_rl_tpu.envs.types import EnvState  # noqa: F401
from active_tracking_rl_tpu.envs.env import TrackEnv, make_env  # noqa: F401
