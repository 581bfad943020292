from .logsumexp import (
    ln_exp_1p,
    expf,
    lse_pair,
    lse_reduce,
    lse_accumulate,
    get_mode,
    set_mode,
    force_mode,
)

__all__ = [
    "ln_exp_1p",
    "expf",
    "lse_pair",
    "lse_reduce",
    "lse_accumulate",
    "get_mode",
    "set_mode",
    "force_mode",
]
