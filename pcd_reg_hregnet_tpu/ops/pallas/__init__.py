from .fps import fps_pallas, weighted_fps_pallas

__all__ = ['fps_pallas', 'weighted_fps_pallas']
