from cgd_tpu.guidance.losses import (  # noqa: F401
    range_loss,
    saturation_loss,
    spherical_dist_loss,
    tv_loss,
)
from cgd_tpu.guidance.cutouts import CutoutSpec, make_cutouts, sample_cutout_coords  # noqa: F401
from cgd_tpu.guidance.prompts import parse_prompt  # noqa: F401
