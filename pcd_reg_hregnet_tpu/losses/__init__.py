from .chamfer import chamfer_distance, chamfer_loss
from .circle import overlap_circle_loss
from .losses import (matching_loss, prob_chamfer_loss, rotation_errors,
                     transformation_loss, translation_errors)
from .mi import DeepMILoss, GlobalInfoNet, LocalInfoNet

__all__ = [
    'chamfer_distance', 'chamfer_loss', 'overlap_circle_loss',
    'matching_loss', 'prob_chamfer_loss', 'transformation_loss',
    'rotation_errors', 'translation_errors',
    'DeepMILoss', 'GlobalInfoNet', 'LocalInfoNet',
]
