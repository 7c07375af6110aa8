from .resnet import (
    RESNET_SPECS,
    init_resnet,
    resnet_from_torch_state_dict,
    extract_features,
    resnet_out_channels,
)
from .seg_network import (
    init_seg_network,
    seg_network_apply,
    seg_network_reduce,
    seg_network_from_torch_state_dict,
)
from .solver import CGState, gauss_newton_cg, init_cg_state, scalar_preconditioner
from .memory import MemoryState, memory_init, memory_update
from .discriminator import (
    DiscConfig, DiscParams, DiscState,
    init_disc_params, disc_init, disc_apply, disc_update, filter_resolve,
    compute_pixel_weights, online_update_weights,
)
from .lsq_stencil import precompute_stencil, project_targets, apply_stencil
from .multilayer import ml_init_params, ml_disc_init, ml_disc_apply, ml_disc_update

__all__ = [
    "RESNET_SPECS", "init_resnet", "resnet_from_torch_state_dict",
    "extract_features", "resnet_out_channels",
    "init_seg_network", "seg_network_apply", "seg_network_reduce",
    "seg_network_from_torch_state_dict",
    "CGState", "gauss_newton_cg", "init_cg_state", "scalar_preconditioner",
    "MemoryState", "memory_init", "memory_update",
    "DiscConfig", "DiscParams", "DiscState",
    "init_disc_params", "disc_init", "disc_apply", "disc_update", "filter_resolve",
    "compute_pixel_weights", "online_update_weights",
    "precompute_stencil", "project_targets", "apply_stencil",
    "ml_init_params", "ml_disc_init", "ml_disc_apply", "ml_disc_update",
]
