"""Training: losses, optimizers, train step, recipes."""
