"""Build the native host-runtime extension: python native/setup.py build_ext --inplace"""

from setuptools import Extension, setup

setup(
    name="rna_algos_native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "rna_algos_native",
            sources=["rna_algos_native.c"],
            extra_compile_args=["-O3", "-std=c11"],
        )
    ],
)
