from .reshape import reshape_temporal_dim
from .misc import (
    expand_like,
    data_transform,
    logit_transform,
    inverse_data_scaler,
    normalize,
    denormalize,
    normalize_phase,
    get_timestamp,
    add_phase,
    collate_batch,
    filter_batch,
    undersample_seg_mask,
)
from .metrics import compute_metrics, nrmse, ssim, mae, mse, compute_snr, compute_mean_and_std
