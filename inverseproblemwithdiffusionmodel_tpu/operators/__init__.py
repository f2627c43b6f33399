from .base import LinearTransform
from .masks import generate_mask, random_cartesian_mask
from .masking import SkipLines
from .fourier import UndersamplingFourier, RandomUndersamplingFourier, SENSE, make_sense
from .finite_diff import FiniteDiff
from .proximal import Proximal, L2Penalty, Constrained, SingleCoil, get_proximal
from ..ops.fft import i2k_complex, k2i_complex
