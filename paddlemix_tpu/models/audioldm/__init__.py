from .hifigan import HiFiGANConfig, HiFiGANModule, HiFiGANVocoder
