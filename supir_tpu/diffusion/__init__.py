from supir_tpu.diffusion.discretization import (
    SIGMA_MAX_LEGACY,
    edm_sigmas,
    karras_sigmas,
    legacy_ddpm_sigma_table,
    legacy_ddpm_sigmas,
    roughly_equally_spaced_steps,
)
from supir_tpu.diffusion.scaling import (
    eps_scaling,
    edm_scaling,
    v_scaling,
    eps_weighting,
    edm_weighting,
    unit_weighting,
    v_weighting,
)
from supir_tpu.diffusion.guidance import (
    cfg_combine,
    linear_cfg_scale,
    vanilla_cfg_scale,
)
from supir_tpu.diffusion.denoiser import DiscreteDenoiser
