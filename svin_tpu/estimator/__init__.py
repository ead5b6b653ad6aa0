from .factors import (
    eval_depth,
    eval_ext_prior,
    eval_imu,
    eval_priors,
    eval_reprojection,
    eval_sonar,
)
from .gauss_newton import OptimizeResult, apply_step, assemble, optimize, total_cost
from .marginalization import marginalize_slot
from .rig import RigParams, rig_params
from .window import (
    DepthFactors,
    ExtrinsicsPrior,
    Factors,
    ImuFactors,
    MarginalPrior,
    PriorFactors,
    ReprojectionFactors,
    SonarFactors,
    WindowConfig,
    WindowState,
    empty_factors,
    empty_window,
)

__all__ = [
    "DepthFactors",
    "ExtrinsicsPrior",
    "Factors",
    "ImuFactors",
    "MarginalPrior",
    "OptimizeResult",
    "PriorFactors",
    "ReprojectionFactors",
    "RigParams",
    "SonarFactors",
    "WindowConfig",
    "WindowState",
    "apply_step",
    "assemble",
    "empty_factors",
    "empty_window",
    "eval_depth",
    "eval_ext_prior",
    "eval_imu",
    "eval_priors",
    "eval_reprojection",
    "eval_sonar",
    "marginalize_slot",
    "optimize",
    "rig_params",
    "total_cost",
]
