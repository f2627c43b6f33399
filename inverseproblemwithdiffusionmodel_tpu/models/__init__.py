from .ema import EmaState
from .ncsnv2 import NCSNv2, NCSNv2Deeper, NCSNv2Deepest
from .ncsn1d import NCSN1D, NCSN1DDeeper, NCSN1DDeepest, UNET1D
from .ncsn3d import NCSN3D, NCSN3DShallow
from .unet import UNet
from .classifier import ResNetClf, ResNet18
from .ncsnpp import NCSNpp
from .ddpm import DDPM
from .simple import ScoreNet
from .ncsn import NCSN, NCSNdeeper
from .registry import (
    TASK_NAME_TO_MODEL_CTOR,
    load_model,
    make_score_fn,
    make_apply_fn,
    make_tube_score_fn_3d,
    build_seg_unet,
    build_clf,
    register_model,
    get_model,
    get_network,
)
