from .backbone import ResNetBackbone
from .fpn import FPN
from .heads import FeatureAlign, PredictionHead
from .layers import FrozenBatchNorm, MakeNet, resize_bilinear
from .stmask import STMask
from .temporal import TemporalNet

__all__ = ['ResNetBackbone', 'FPN', 'FeatureAlign', 'PredictionHead',
           'FrozenBatchNorm', 'MakeNet', 'resize_bilinear', 'STMask',
           'TemporalNet']
