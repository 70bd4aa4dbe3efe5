from .policy import SplinePolicy, policy_action, resample_policy, knot_times
from .sampling import SamplingConfig, sampling_plan
from .cem import CEMConfig, CEMState, cem_init, cem_plan
from .mppi import MPPIConfig, mppi_plan

__all__ = [
    "SplinePolicy", "policy_action", "resample_policy", "knot_times",
    "SamplingConfig", "sampling_plan",
    "CEMConfig", "CEMState", "cem_init", "cem_plan",
    "MPPIConfig", "mppi_plan",
]
