"""pcd_reg_hregnet_tpu — TPU-native LiDAR point-cloud registration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
UpendraArun/pcd_reg_hregnet (HRegNet-style hierarchical LiDAR-to-LiDAR
registration on MAN TruckScenes, with mutual-information and
PointTransformerV3 adaptions, ICP refinement, and calibration metrics).
"""

__version__ = '0.1.0'

from . import geometry, ops

__all__ = ['geometry', 'ops']
