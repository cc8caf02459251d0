from moleculesde_tpu.sde.base import (
    SDE,
    VPSDE,
    VESDE,
    SubVPSDE,
    get_beta_schedule,
    make_sde,
)

__all__ = ["SDE", "VPSDE", "VESDE", "SubVPSDE", "get_beta_schedule", "make_sde"]
