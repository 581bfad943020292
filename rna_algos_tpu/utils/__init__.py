from .io import (
    FastaRecord,
    read_fasta,
    bytes2seq,
    seq2str,
    align_char2base,
    read_align_clustal,
    read_align_fasta,
    read_align_stockholm,
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
    "fold_str",
    "pairs_from_fold_str",
]
