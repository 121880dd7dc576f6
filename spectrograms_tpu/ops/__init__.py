"""TPU-native compute ops: framing, DFT/STFT, filterbanks, transforms."""
