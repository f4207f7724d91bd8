from .registration import HierFeatureExtraction, RegistrationModel
from .zoo import available, build, model_config

__all__ = ['HierFeatureExtraction', 'RegistrationModel',
           'available', 'build', 'model_config']
