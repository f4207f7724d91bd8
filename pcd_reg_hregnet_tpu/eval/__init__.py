from .calib_eval import CalibEval, MultiLayerCalibEval
from .icp import (estimate_normals, icp_point_to_plane, icp_point_to_point,
                  refine)

__all__ = ['CalibEval', 'MultiLayerCalibEval', 'refine',
           'icp_point_to_point', 'icp_point_to_plane', 'estimate_normals']
