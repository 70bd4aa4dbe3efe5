from .policy import (SplinePolicy, init_policy, policy_action,
                     resample_policy, knot_times)
from .sampling import SamplingConfig, sampling_plan
from .cem import CEMConfig, CEMState, cem_init, cem_plan
from .mppi import MPPIConfig, mppi_plan
from .ilqg import (ILQGConfig, ILQGPolicy, ILQGState, ilqg_action,
                   ilqg_init, ilqg_plan)
from .gradient import GradientConfig, gradient_plan
from .ilqs import ILQSConfig, ILQSState, ilqs_init, ilqs_plan
from .robust import RobustConfig, robust_plan
from .sample_gradient import (SampleGradientConfig, SampleGradientState,
                              sample_gradient_init, sample_gradient_plan)

__all__ = [
    "SplinePolicy", "init_policy", "policy_action", "resample_policy", "knot_times",
    "SamplingConfig", "sampling_plan",
    "CEMConfig", "CEMState", "cem_init", "cem_plan",
    "MPPIConfig", "mppi_plan",
    "ILQGConfig", "ILQGPolicy", "ILQGState", "ilqg_action", "ilqg_init",
    "ilqg_plan",
    "GradientConfig", "gradient_plan",
    "ILQSConfig", "ILQSState", "ilqs_init", "ilqs_plan",
    "RobustConfig", "robust_plan",
    "SampleGradientConfig", "SampleGradientState", "sample_gradient_init",
    "sample_gradient_plan",
]
