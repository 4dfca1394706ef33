from .norms import ChannelLayerNorm, ChannelRMSNorm
from .attention import (
    Attention,
    LinearAttention,
    LinearAttentionBlock,
    CrossAttention,
    MaskedAttention,
    FeedForward,
    UnifiedAttention,
    AttentionBlock,
    MiddleAttentionBlock,
)
from .unet import (
    Unet,
    AudioVisualModel,
    SinusoidalPosEmb,
    WeightStandardizedConv,
    ResnetBlock,
)
