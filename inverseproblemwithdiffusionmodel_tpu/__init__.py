"""TPU-native score-based diffusion framework for MRI inverse problems.

A ground-up JAX / Flax / Pallas re-design of the capabilities of the
reference `InverseProblemWithDiffusionModel` repo (PyTorch/CUDA):

- score-network training (NCSNv2 2D/1D/3D, NCSN++/DDPM continuous) with
  denoising score matching over a geometric sigma ladder,
- annealed-Langevin-dynamics (ALD) reconstruction of undersampled k-space
  (single-coil and multi-coil SENSE) with proximal data-consistency steps,
- classifier/segmentation-guided sampling, MAP and TV baselines,
- a factorized 2D+time sampler for cardiac cine MR.

Design principles (TPU-first, not a port):
- arrays are channel-last (B, *spatial, C); convs map to
  `lax.conv_general_dilated` NHWC/NWC/NDHWC,
- every sampler loop compiles to a single XLA computation
  (`jax.lax.scan` over the noise ladder, FFT data-consistency fused in),
- real/imag score evaluations are batched into one forward pass,
- reconstruction ensembles shard over a `jax.sharding.Mesh`,
- explicit `jax.random` keys everywhere (no global RNG).
"""

__version__ = "0.1.0"
