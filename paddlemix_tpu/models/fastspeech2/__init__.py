from .modeling import (
    FastSpeech2Config,
    FastSpeech2Model,
    fastspeech2_loss,
    griffin_lim,
    length_regulate,
)
