"""Model zoo: UNets, VAE, wav2vec2, projection heads, face locator."""
