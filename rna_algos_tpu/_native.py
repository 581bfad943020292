"""Loader for the optional native host-runtime extension (native/)."""

try:  # built by `make native` into the package directory
    from . import rna_algos_native as _mod
except ImportError:
    try:
        import rna_algos_native as _mod  # site-installed
    except ImportError:
        _mod = None

native = _mod


def has_native():
    return native is not None
