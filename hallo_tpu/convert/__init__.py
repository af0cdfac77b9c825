"""One-time PyTorch -> JAX weight converters (SD-1.5 / AnimateDiff / VAE /
wav2vec2 / hallo net.pth)."""
