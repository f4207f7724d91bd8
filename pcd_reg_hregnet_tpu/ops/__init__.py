from .hilbert import hilbert_decode, hilbert_keys, serialize_hilbert
from .neighbors import (ball_query, knn, knn_gather, knn_group,
                        pairwise_sqdist, three_nn_interpolate)
from .procrustes import weighted_kabsch
from .sampling import fps, gather_points, weighted_fps
from .serialization import (grid_coords, serialize, z_order_decode,
                            z_order_keys)

__all__ = [
    'fps', 'weighted_fps', 'gather_points',
    'knn', 'knn_gather', 'knn_group', 'pairwise_sqdist',
    'ball_query', 'three_nn_interpolate',
    'weighted_kabsch',
    'serialize', 'z_order_keys', 'z_order_decode', 'grid_coords',
    'hilbert_keys', 'hilbert_decode', 'serialize_hilbert',
]
