from . import turner
from . import contrafold
from . import contralign
from .contrafold import build_fold_score_sets, parse_contrafold_params
from .contralign import build_align_scores, parse_contralign_params

__all__ = [
    "turner",
    "contrafold",
    "contralign",
    "build_fold_score_sets",
    "parse_contrafold_params",
    "build_align_scores",
    "parse_contralign_params",
]
