"""DDPM score UNet (continuous stack), registered "ddpm".

Reference semantics: models/ddpm.py:40-181 — sinusoidal timestep embedding,
per-resolution DDPM residual blocks with attention at configured
resolutions, nearest-neighbor / strided-conv resampling, optional
`scale_by_sigma` for NCSN-loss training. NHWC, nn.compact.
"""
from __future__ import annotations

import functools
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from . import layerspp
from .layers import get_act
from ..samplers.sigmas import sigma_ladder

conv3x3 = layerspp.ddpm_conv3x3


class DDPM(nn.Module):
    """DDPM UNet (reference: models/ddpm.py:40)."""
    config: Any

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels: jnp.ndarray,
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

        # the original DDPM UNet pins GroupNorm to 32 groups at every
        # width (reference models/layers.py:563,626,631), unlike NCSN++'s
        # min(ch//4, 32)
        ResnetBlock = functools.partial(
            layerspp.ResnetBlockDDPMpp, act=act, dropout=dropout,
            skip_rescale=False, temb_dim=4 * nf, num_groups=32)
        AttnBlock = functools.partial(layerspp.AttnBlockpp,
                                      skip_rescale=False, init_scale=0.0,
                                      num_groups=32)

        if cfg.model.conditional:
            temb = layerspp.get_timestep_embedding(labels, nf)
            temb = nn.Dense(nf * 4, kernel_init=layerspp.default_init(),
                            name="temb_dense0")(temb)
            temb = nn.Dense(nf * 4, kernel_init=layerspp.default_init(),
                            name="temb_dense1")(act(temb))
        else:
            temb = None

        h = x if cfg.data.centered else 2 * x - 1.0

        block = 0

        def rb(h, temb, **kw):
            nonlocal block
            out = ResnetBlock(name=f"res_{block}", **kw)(h, temb, train=train)
            block += 1
            return out

        hs = [conv3x3(nf, name="conv_in")(h)]
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
                hs.append(layerspp.Downsample(
                    with_conv=resamp_with_conv,
                    name=f"down_{i_level}")(hs[-1]))

        h = hs[-1]
        h = rb(h, temb)
        h = AttnBlock(name="attn_mid")(h)
        h = rb(h, temb)

        for i_level in reversed(range(num_resolutions)):
            for i_block in range(num_res_blocks + 1):
                out_ch = nf * ch_mult[i_level]
                h = rb(jnp.concatenate([h, hs.pop()], axis=-1), temb,
                       out_ch=out_ch)
            if all_resolutions[i_level] in attn_resolutions:
                h = AttnBlock(name=f"attn_u{i_level}")(h)
            if i_level != 0:
                h = layerspp.Upsample(with_conv=resamp_with_conv,
                                      name=f"up_{i_level}")(h)

        assert not hs
        h = act(nn.GroupNorm(num_groups=32, epsilon=1e-6,
                             name="norm_out")(h))
        h = conv3x3(x.shape[-1], init_scale=0.0, name="conv_out")(h)

        if cfg.model.scale_by_sigma:
            sigmas = sigma_ladder(cfg.model.sigma_max, cfg.model.sigma_min,
                                  cfg.model.num_scales, "geometric")
            used = sigmas[labels.astype(jnp.int32)]
            h = h / used.reshape(-1, *([1] * (h.ndim - 1)))
        return h
