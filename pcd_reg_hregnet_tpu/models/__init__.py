from .ptv3 import (PointTransformerEncoder, PointTransformerV3,
                   SerializedPooling, SerializedUnpooling)
from .registration import HierFeatureExtraction, RegistrationModel
from .zoo import available, build, model_config

__all__ = ['HierFeatureExtraction', 'RegistrationModel',
           'PointTransformerEncoder', 'PointTransformerV3',
           'SerializedPooling', 'SerializedUnpooling',
           'available', 'build', 'model_config']
