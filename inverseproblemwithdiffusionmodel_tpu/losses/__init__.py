from .dsm import anneal_dsm_score_estimation, continuous_dsm_loss
from .guidance import clf_loss_with_perturbation, seg_loss_with_perturbation, dice_ce_loss
