from .io import (
    FastaRecord,
    read_fasta,
    bytes2seq,
    seq2str,
    align_char2base,
    read_align_clustal,
    read_align_fasta,
    read_align_stockholm,
    align_from_cols,
    Align,
)
from .output import fold_str, pairs_from_fold_str

__all__ = [
    "FastaRecord",
    "read_fasta",
    "bytes2seq",
    "seq2str",
    "align_char2base",
    "read_align_clustal",
    "read_align_fasta",
    "read_align_stockholm",
    "Align",
    "align_from_cols",
    "fold_str",
    "pairs_from_fold_str",
]
