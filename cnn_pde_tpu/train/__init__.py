"""L4 train/eval engine."""

from .checkpoint import load_checkpoint, restore_state, save_checkpoint
from .loop import (GracefulPreemption, TrainConfig, Trainer, TrainState,
                   pde_param_stats)
from .losses import cross_entropy, hybrid_pde_regularization
from .metrics import classification_report, confusion_matrix, per_class_accuracy
from .optim import (ParamGroup, build_optimizer,
                    scale_by_adam_low_precision)
from .schedules import constant, cosine_annealing, onecycle
from .sinks import (CSVSink, JSONLSink, MetricsSink, MultiSink,
                    TensorBoardSink, sink_from_path)

__all__ = [
    "load_checkpoint",
    "restore_state",
    "save_checkpoint",
    "GracefulPreemption",
    "TrainConfig",
    "Trainer",
    "TrainState",
    "pde_param_stats",
    "cross_entropy",
    "hybrid_pde_regularization",
    "classification_report",
    "confusion_matrix",
    "per_class_accuracy",
    "ParamGroup",
    "build_optimizer",
    "scale_by_adam_low_precision",
    "constant",
    "cosine_annealing",
    "onecycle",
    "CSVSink",
    "JSONLSink",
    "MetricsSink",
    "MultiSink",
    "TensorBoardSink",
    "sink_from_path",
]
