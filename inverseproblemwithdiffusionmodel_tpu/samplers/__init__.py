from .sigmas import get_sigmas, get_lh_weights
from .ald import (
    ALDConfig,
    ald_unconditional_sampler,
    ald_inverse_seg_proximal_real_imag,
    ald_2d_time,
)
from .map_opt import (
    MAPConfig,
    map_optimizer,
    map_optimizer_2d_time,
    tv_reconstruction,
)
