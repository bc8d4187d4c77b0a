"""Build the native host kernels: python csrc/setup.py build_ext --inplace

Produces _mdir_native*.so next to the mdir_tpu package (repo root);
mdir_tpu.ops.clahe picks it up automatically when importable.
"""
import os

from setuptools import Extension, setup

HERE = os.path.dirname(os.path.abspath(__file__))

setup(
    name="mdir-tpu-native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "_mdir_native",
            sources=[os.path.join(HERE, "clahe_native.c")],
            extra_compile_args=["-O3"],
        ),
    ],
    script_args=os.sys.argv[1:] or ["build_ext", "--inplace"],
)
