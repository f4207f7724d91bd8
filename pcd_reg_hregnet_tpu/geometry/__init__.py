from . import se3, so3, rotations, perturbations

__all__ = ['se3', 'so3', 'rotations', 'perturbations']
