from .mccaskill import mccaskill_bpp, mccaskill_bpp_batch
from .centroid import centroid_fold, mea_fill, mea_fill_gammas, traceback, DEFAULT_GAMMAS
from .durbin import durbin_match_probs, durbin_match_probs_batch

__all__ = [
    "mccaskill_bpp",
    "mccaskill_bpp_batch",
    "centroid_fold",
    "mea_fill",
    "mea_fill_gammas",
    "traceback",
    "DEFAULT_GAMMAS",
    "durbin_match_probs",
    "durbin_match_probs_batch",
]
