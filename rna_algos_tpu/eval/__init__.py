from . import stats
from . import rfam
from . import pipeline

__all__ = ["stats", "rfam", "pipeline"]
