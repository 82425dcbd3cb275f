try:  # MLlib is optional — engine core never depends on it
    from .champion_model import (
        temporal_split,
        train_champion_model,
        evaluate_topk,
        baseline_points_leader,
        baseline_previous_champion,
        walk_forward_evaluate,
    )

    __all__ = [
        "temporal_split",
        "train_champion_model",
        "evaluate_topk",
        "baseline_points_leader",
        "baseline_previous_champion",
        "walk_forward_evaluate",
    ]
except ImportError:  # pragma: no cover
    __all__ = []
