from .gan import discriminator_loss, feature_loss, generator_loss
from .multiscale_mel import MultiScaleMelSpectrogramLoss
from .silence import (
    detect_silence_regions,
    silence_aware_loss,
    simple_silence_aware_mel_loss,
    spectral_consistency_loss,
    energy_regularization_loss,
)
from .binaural_enhanced import enhanced_l1_loss, BinauralEnhancedLoss
