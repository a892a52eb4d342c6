from . import anchors, boxes, correlation, deform_conv, masks, matcher, nms
from . import roi_align, sampling

__all__ = ['anchors', 'boxes', 'correlation', 'deform_conv', 'masks',
           'matcher', 'nms', 'roi_align', 'sampling']
