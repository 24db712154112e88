from cgd_tpu.diffusion.schedules import (  # noqa: F401
    get_named_beta_schedule,
    ScheduleCoefficients,
)
from cgd_tpu.diffusion.respace import space_timesteps  # noqa: F401
from cgd_tpu.diffusion.gaussian import GaussianDiffusion, make_diffusion  # noqa: F401
