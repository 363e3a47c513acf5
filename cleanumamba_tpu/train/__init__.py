"""Training subsystem: optax optimisation, LR schedule, data-parallel train
step over a device mesh, checkpointing."""
