from .sampling import fps, weighted_fps, gather_points
from .neighbors import knn, knn_gather, knn_group, pairwise_sqdist
from .procrustes import weighted_kabsch
from .serialization import serialize, z_order_keys, grid_coords

__all__ = [
    'fps', 'weighted_fps', 'gather_points',
    'knn', 'knn_gather', 'knn_group', 'pairwise_sqdist',
    'weighted_kabsch',
    'serialize', 'z_order_keys', 'grid_coords',
]
