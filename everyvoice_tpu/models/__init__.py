"""Model zoo: FastSpeech2 (text→spec), HiFiGAN/iSTFTNet (spec→wav),
StyleTTS2 (text→wav, e2e), wav2vec2 aligner (segmentation)."""
