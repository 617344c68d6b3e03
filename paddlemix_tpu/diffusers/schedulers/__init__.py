"""Schedulers as pure solvers over explicit state (jit/fori_loop native).

Coverage tracks the reference's scheduler zoo
(ppdiffusers/ppdiffusers/schedulers/, 33 schedulers); the long tail is being
added behind the same Scheduler/State pattern."""

from .common import Scheduler, SchedulerConfig
from .scheduling_ddim import DDIMConfig, DDIMScheduler, DDIMState
from .scheduling_ddpm import DDPMConfig, DDPMScheduler, DDPMState
from .scheduling_dpmsolver import (
    DPMSolverConfig,
    DPMSolverMultistepScheduler,
    DPMSolverSinglestepScheduler,
    DPMSolverState,
    DPMSolverUniDiffuserScheduler,
)
from .scheduling_euler import (
    EulerAncestralDiscreteScheduler,
    EulerConfig,
    EulerDiscreteScheduler,
    EulerState,
)
from .scheduling_flow_match import FlowMatchConfig, FlowMatchEulerDiscreteScheduler, FlowMatchState
from .scheduling_heun import HeunConfig, HeunDiscreteScheduler, HeunState
from .scheduling_lcm import LCMConfig, LCMScheduler, LCMState
from .scheduling_pndm import PNDMConfig, PNDMScheduler, PNDMState
from .scheduling_extra import (
    CMStochasticIterativeScheduler,
    DEISMultistepScheduler,
    DPMSolverSDEScheduler,
)
from .scheduling_wuerstchen import DDPMWuerstchenConfig, DDPMWuerstchenScheduler
from .scheduling_unipc import UniPCConfig, UniPCMultistepScheduler, UniPCState
from .scheduling_edm import EDMConfig, EDMDPMSolverMultistepScheduler, EDMEulerScheduler
from .scheduling_kdpm2 import (
    KDPM2AncestralDiscreteScheduler,
    KDPM2Config,
    KDPM2DiscreteScheduler,
)
from .scheduling_lms import IPNDMScheduler, LMSConfig, LMSDiscreteScheduler
from .scheduling_inverse import (
    DDIMInverseScheduler,
    DDIMParallelScheduler,
    DDPMParallelScheduler,
    DPMSolverMultistepInverseScheduler,
)
from .scheduling_specialty import (
    ConsistencyDecoderScheduler,
    KarrasVeScheduler,
    RePaintScheduler,
    ScoreSdeVeScheduler,
    UnCLIPScheduler,
)

SCHEDULER_REGISTRY = {
    "DDIMScheduler": DDIMScheduler,
    "DDPMScheduler": DDPMScheduler,
    "DPMSolverMultistepScheduler": DPMSolverMultistepScheduler,
    "EulerDiscreteScheduler": EulerDiscreteScheduler,
    "EulerAncestralDiscreteScheduler": EulerAncestralDiscreteScheduler,
    "FlowMatchEulerDiscreteScheduler": FlowMatchEulerDiscreteScheduler,
    "LCMScheduler": LCMScheduler,
    "HeunDiscreteScheduler": HeunDiscreteScheduler,
    "PNDMScheduler": PNDMScheduler,
    "UniPCMultistepScheduler": UniPCMultistepScheduler,
    "DEISMultistepScheduler": DEISMultistepScheduler,
    "CMStochasticIterativeScheduler": CMStochasticIterativeScheduler,
    "DPMSolverSDEScheduler": DPMSolverSDEScheduler,
    "DDPMWuerstchenScheduler": DDPMWuerstchenScheduler,
    "DPMSolverSinglestepScheduler": DPMSolverSinglestepScheduler,
    "DPMSolverUniDiffuserScheduler": DPMSolverUniDiffuserScheduler,
    "EDMEulerScheduler": EDMEulerScheduler,
    "EDMDPMSolverMultistepScheduler": EDMDPMSolverMultistepScheduler,
    "KDPM2DiscreteScheduler": KDPM2DiscreteScheduler,
    "KDPM2AncestralDiscreteScheduler": KDPM2AncestralDiscreteScheduler,
    "LMSDiscreteScheduler": LMSDiscreteScheduler,
    "IPNDMScheduler": IPNDMScheduler,
    "DDIMInverseScheduler": DDIMInverseScheduler,
    "DPMSolverMultistepInverseScheduler": DPMSolverMultistepInverseScheduler,
    "DDIMParallelScheduler": DDIMParallelScheduler,
    "DDPMParallelScheduler": DDPMParallelScheduler,
    "RePaintScheduler": RePaintScheduler,
    "ScoreSdeVeScheduler": ScoreSdeVeScheduler,
    "UnCLIPScheduler": UnCLIPScheduler,
    "ConsistencyDecoderScheduler": ConsistencyDecoderScheduler,
    "KarrasVeScheduler": KarrasVeScheduler,
}


class PreconfigEulerAncestralDiscreteScheduler(EulerAncestralDiscreteScheduler):
    """Reference preconfig/preconfig_scheduling_euler_ancestral_discrete.py:
    precomputes per-step sigma tables at set_timesteps to avoid per-step host
    math. Our schedulers are state-pytree solvers whose set_timesteps already
    precomputes every table and whose step is jitted — the preconfig variant
    is the base class by construction; kept as a named alias for
    model_index.json compatibility."""


class PreconfigLMSDiscreteScheduler(LMSDiscreteScheduler):
    """Reference preconfig/preconfig_scheduling_lms_discrete.py; see
    PreconfigEulerAncestralDiscreteScheduler — the LMS coefficient matrix is
    already precomputed in set_timesteps here."""


SCHEDULER_REGISTRY["PreconfigEulerAncestralDiscreteScheduler"] = \
    PreconfigEulerAncestralDiscreteScheduler
SCHEDULER_REGISTRY["PreconfigLMSDiscreteScheduler"] = PreconfigLMSDiscreteScheduler
from .scheduling_vq_diffusion import (
    VQDiffusionConfig,
    VQDiffusionScheduler,
    VQDiffusionState,
)

SCHEDULER_REGISTRY["VQDiffusionScheduler"] = VQDiffusionScheduler
