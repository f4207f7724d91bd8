from .pose_graph import (PoseGraph, chi2, distributed_optimize, optimize,
                         residuals)

__all__ = ['PoseGraph', 'optimize', 'distributed_optimize', 'residuals', 'chi2']
