from .pinn import (PINNConfig, field, init_params, loss, make_train_step,
                   residual, spatial_derivative)

__all__ = [
    "PINNConfig",
    "field",
    "init_params",
    "loss",
    "make_train_step",
    "residual",
    "spatial_derivative",
]
