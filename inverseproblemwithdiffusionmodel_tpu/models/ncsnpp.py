"""NCSN++ / DDPM++ score UNet (continuous stack flagship).

Reference semantics: models/ncsnpp.py:35-381 — Fourier/positional noise
embedding, progressive input/output pyramids, DDPM or BigGAN residual
blocks, attention at configured resolutions, `scale_by_sigma` output
division. Registered as "ncsnpp".

TPU-first: nn.compact dataflow (no module-index bookkeeping), NHWC layout,
FIR resampling through the XLA-fused upfirdn2d. `__call__(x, time_cond)`:
for `embedding_type='fourier'` time_cond is the per-sample sigma VALUES;
for 'positional' it is integer ladder indices (the reference convention,
ncsnpp.py:236-246).
"""
from __future__ import annotations

import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from . import layerspp
from .layers import get_act
from ..samplers.sigmas import sigma_ladder

conv3x3 = layerspp.ddpm_conv3x3


class NCSNpp(nn.Module):
    """NCSN++ (reference: models/ncsnpp.py:35)."""
    config: Any

    @nn.compact
    def __call__(self, x: jnp.ndarray, time_cond: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        cfg = self.config
        act = get_act(cfg)
        nf = cfg.model.nf
        ch_mult = tuple(cfg.model.ch_mult)
        num_res_blocks = cfg.model.num_res_blocks
        attn_resolutions = tuple(cfg.model.attn_resolutions)
        dropout = cfg.model.dropout
        resamp_with_conv = cfg.model.resamp_with_conv
        num_resolutions = len(ch_mult)
        all_resolutions = [cfg.data.image_size // (2 ** i)
                           for i in range(num_resolutions)]
        conditional = cfg.model.conditional
        fir = cfg.model.fir
        fir_kernel = tuple(cfg.model.fir_kernel)
        skip_rescale = cfg.model.skip_rescale
        resblock_type = cfg.model.resblock_type.lower()
        progressive = cfg.model.progressive.lower()
        progressive_input = cfg.model.progressive_input.lower()
        embedding_type = cfg.model.embedding_type.lower()
        init_scale = cfg.model.init_scale
        combine_method = cfg.model.progressive_combine.lower()
        assert progressive in ("none", "output_skip", "residual")
        assert progressive_input in ("none", "input_skip", "residual")
        assert embedding_type in ("fourier", "positional")

        AttnBlock = functools.partial(layerspp.AttnBlockpp,
                                      init_scale=init_scale,
                                      skip_rescale=skip_rescale)
        Up = functools.partial(layerspp.Upsample, with_conv=resamp_with_conv,
                               fir=fir, fir_kernel=fir_kernel)
        Down = functools.partial(layerspp.Downsample,
                                 with_conv=resamp_with_conv, fir=fir,
                                 fir_kernel=fir_kernel)
        if resblock_type == "ddpm":
            ResnetBlock = functools.partial(
                layerspp.ResnetBlockDDPMpp, act=act, dropout=dropout,
                init_scale=init_scale, skip_rescale=skip_rescale,
                temb_dim=nf * 4)
        elif resblock_type == "biggan":
            ResnetBlock = functools.partial(
                layerspp.ResnetBlockBigGANpp, act=act, dropout=dropout,
                fir=fir, fir_kernel=fir_kernel, init_scale=init_scale,
                skip_rescale=skip_rescale, temb_dim=nf * 4)
        else:
            raise ValueError(f"resblock type {resblock_type} unrecognized")

        # --- noise embedding -------------------------------------------------
        if embedding_type == "fourier":
            used_sigmas = time_cond
            temb = layerspp.GaussianFourierProjection(
                embedding_size=nf, scale=cfg.model.fourier_scale,
                name="fourier_proj")(jnp.log(used_sigmas))
        else:
            timesteps = time_cond
            sigmas = sigma_ladder(cfg.model.sigma_max, cfg.model.sigma_min,
                                  cfg.model.num_scales, "geometric")
            used_sigmas = sigmas[time_cond.astype(jnp.int32)]
            temb = layerspp.get_timestep_embedding(timesteps, nf)

        if conditional:
            temb = nn.Dense(nf * 4, kernel_init=layerspp.default_init(),
                            name="temb_dense0")(temb)
            temb = nn.Dense(nf * 4, kernel_init=layerspp.default_init(),
                            name="temb_dense1")(act(temb))
        else:
            temb = None

        if not cfg.data.centered:
            x = 2 * x - 1.0

        # --- downsampling ----------------------------------------------------
        input_pyramid = x if progressive_input != "none" else None
        block = 0

        def rb(h, temb, **kw):
            nonlocal block
            out = ResnetBlock(name=f"res_{block}", **kw)(h, temb, train=train)
            block += 1
            return out

        hs = [conv3x3(nf, name="conv_in")(x)]
        in_ch = nf
        for i_level in range(num_resolutions):
            for i_block in range(num_res_blocks):
                out_ch = nf * ch_mult[i_level]
                h = rb(hs[-1], temb, out_ch=out_ch)
                in_ch = out_ch
                if all_resolutions[i_level] in attn_resolutions:
                    h = AttnBlock(name=f"attn_d{i_level}_{i_block}")(h)
                hs.append(h)
            if i_level != num_resolutions - 1:
                if resblock_type == "ddpm":
                    h = Down(name=f"down_{i_level}")(hs[-1])
                else:
                    h = rb(hs[-1], temb, down=True)
                if progressive_input == "input_skip":
                    input_pyramid = layerspp.Downsample(
                        fir=fir, fir_kernel=fir_kernel, with_conv=False,
                        name=f"pyr_down_{i_level}")(input_pyramid)
                    h = layerspp.Combine(
                        features=h.shape[-1], method=combine_method,
                        name=f"combine_{i_level}")(input_pyramid, h)
                    in_ch = h.shape[-1]
                elif progressive_input == "residual":
                    input_pyramid = layerspp.Downsample(
                        out_ch=in_ch, fir=fir, fir_kernel=fir_kernel,
                        with_conv=True,
                        name=f"pyr_down_{i_level}")(input_pyramid)
                    input_pyramid = (input_pyramid + h) / np.sqrt(2.0) \
                        if skip_rescale else input_pyramid + h
                    h = input_pyramid
                hs.append(h)

        h = hs[-1]
        h = rb(h, temb)
        h = AttnBlock(name="attn_mid")(h)
        h = rb(h, temb)

        # --- upsampling ------------------------------------------------------
        pyramid = None
        for i_level in reversed(range(num_resolutions)):
            for i_block in range(num_res_blocks + 1):
                out_ch = nf * ch_mult[i_level]
                h = rb(jnp.concatenate([h, hs.pop()], axis=-1), temb,
                       out_ch=out_ch)
            if all_resolutions[i_level] in attn_resolutions:
                h = AttnBlock(name=f"attn_u{i_level}")(h)

            if progressive != "none":
                if i_level == num_resolutions - 1:
                    if progressive == "output_skip":
                        pyramid = act(layerspp.group_norm(
                            h.shape[-1], f"pyr_norm_{i_level}")(h))
                        pyramid = conv3x3(x.shape[-1], init_scale=init_scale,
                                          name=f"pyr_conv_{i_level}")(pyramid)
                    else:  # residual
                        pyramid = act(layerspp.group_norm(
                            h.shape[-1], f"pyr_norm_{i_level}")(h))
                        pyramid = conv3x3(h.shape[-1],
                                          name=f"pyr_conv_{i_level}")(pyramid)
                else:
                    if progressive == "output_skip":
                        pyramid = layerspp.Upsample(
                            fir=fir, fir_kernel=fir_kernel, with_conv=False,
                            name=f"pyr_up_{i_level}")(pyramid)
                        pyramid_h = act(layerspp.group_norm(
                            h.shape[-1], f"pyr_norm_{i_level}")(h))
                        pyramid_h = conv3x3(x.shape[-1], init_scale=init_scale,
                                            name=f"pyr_conv_{i_level}")(pyramid_h)
                        pyramid = pyramid + pyramid_h
                    else:  # residual
                        pyramid = layerspp.Upsample(
                            out_ch=h.shape[-1], fir=fir, fir_kernel=fir_kernel,
                            with_conv=True,
                            name=f"pyr_up_{i_level}")(pyramid)
                        pyramid = (pyramid + h) / np.sqrt(2.0) \
                            if skip_rescale else pyramid + h
                        h = pyramid

            if i_level != 0:
                if resblock_type == "ddpm":
                    h = Up(name=f"up_{i_level}")(h)
                else:
                    h = rb(h, temb, up=True)

        assert not hs

        if progressive == "output_skip":
            h = pyramid
        else:
            h = act(layerspp.group_norm(h.shape[-1], "norm_out")(h))
            h = conv3x3(x.shape[-1], init_scale=init_scale,
                        name="conv_out")(h)

        if cfg.model.scale_by_sigma:
            h = h / used_sigmas.reshape(-1, *([1] * (h.ndim - 1)))
        return h
