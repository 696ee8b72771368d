"""I/O: torch-free .pt checkpoint codec, media read/write, config dump."""
