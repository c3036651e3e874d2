from .criterion import CriterionConfig, set_criterion, match_outputs
from .matcher import (
    batch_dice_cost,
    batch_sigmoid_ce_cost,
    hungarian_assign,
    match_costs,
    sample_match_points,
)

__all__ = [
    "CriterionConfig",
    "set_criterion",
    "match_outputs",
    "batch_dice_cost",
    "batch_sigmoid_ce_cost",
    "hungarian_assign",
    "match_costs",
    "sample_match_points",
]
