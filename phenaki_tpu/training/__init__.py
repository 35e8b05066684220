"""Training runtime: optimizers, EMA, checkpointing, trainers."""
