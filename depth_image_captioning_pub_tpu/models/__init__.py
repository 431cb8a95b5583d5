"""flax.linen model zoo: backbones, encoders, caption decoders, DPT."""
