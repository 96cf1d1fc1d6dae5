from .assemble import get_work_data, numeric_feature_columns
from .train import build_models, TrainResult
from .score import score_items, assemble_predictions

__all__ = [
    "get_work_data",
    "numeric_feature_columns",
    "build_models",
    "TrainResult",
    "score_items",
    "assemble_predictions",
]
