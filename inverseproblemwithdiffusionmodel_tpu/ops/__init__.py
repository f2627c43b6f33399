from .fft import i2k_complex, k2i_complex
from .resize import resize_align_corners, resize_half_pixel
from .upfirdn2d import upfirdn2d, upsample_2d, downsample_2d
from .fused_act import fused_leaky_relu
