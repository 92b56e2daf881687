"""supir-tpu: a TPU-native (JAX/XLA/Pallas/pjit) photo-realistic blind image
restoration framework with the capabilities of SUPIR (CVPR 2024).

Layer map (mirrors SURVEY.md section 1, re-architected for TPU):

  ops/        Pallas kernels + XLA fallbacks (fused attention, GroupNorm+SiLU)
  models/     flax.linen networks: VAE, SDXL UNet, GLVControl/ZeroSFT control path,
              text/vector embedders
  diffusion/  pure-function diffusion runtime: sigma schedules, scalings,
              CFG guidance, denoiser, lax.scan samplers
  engine/     SUPIREngine orchestration (stage-1 denoise, full sample pipeline)
  parallel/   mesh construction, sharding rules, sharded tiled diffusion/VAE
  utils/      color fix, tiling geometry, image I/O, checkpoint conversion
  captioner/  LLaVA-style captioner subsystem
  serve/      HTTP controller/worker serving plane
"""

__version__ = "0.1.0"
