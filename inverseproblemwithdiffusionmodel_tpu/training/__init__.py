"""Training infrastructure: sharded train steps, EMA-tracking train state,
orbax checkpointing, epoch loop (Lightning-free replacement for the
reference's helpers/pl_helpers.py + pl_callbacks.py)."""
from .state import TrainState, get_optimizer
from .train import (make_score_train_step, make_clf_train_step,
                    make_seg_train_step, make_score_eval_step,
                    make_continuous_score_train_step)
from .checkpoint import Checkpointer
from .loop import (FitConfig, MetricsLogger, fit, batch_iterator,
                   make_train_iterator)
from .callbacks import (make_ald_visualization_hook,
                        make_pc_visualization_hook, make_snapshot_hook)

__all__ = [
    "TrainState", "get_optimizer", "make_score_train_step",
    "make_clf_train_step", "make_seg_train_step", "make_score_eval_step",
    "make_continuous_score_train_step",
    "Checkpointer", "FitConfig", "MetricsLogger", "fit", "batch_iterator",
    "make_train_iterator",
    "make_ald_visualization_hook", "make_pc_visualization_hook",
    "make_snapshot_hook",
]
