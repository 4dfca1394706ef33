from .pipeline import BinauralPipeline
from .stage1 import (
    MEL_MAX,
    MEL_MIN,
    Stage1Sampler,
    denormalize_mel,
    generate_clip,
    normalize_mel,
)
from .vocoder import (
    Vocoder,
    detect_and_exclude_zero_frames,
    reconstruct_audio_with_silence,
)
