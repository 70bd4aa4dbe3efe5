from .rewards import standup_reward, control_input_reward, RewardResult
from .env import EnvConfig, EnvState, env_reset, env_step, batch_reset, \
    batch_step

__all__ = ["standup_reward", "control_input_reward", "RewardResult",
           "EnvConfig", "EnvState", "env_reset", "env_step",
           "batch_reset", "batch_step"]
