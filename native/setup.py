"""Build the native IO extension:  cd native && python setup.py build_ext --inplace
(or `make native` at the repo root)."""

from setuptools import Extension, setup

setup(
    name="scythe_native_io",
    ext_modules=[
        Extension(
            "scythe_native_io",
            sources=["scythe_io.cpp"],
            extra_compile_args=["-O3", "-std=c++17"],
        )
    ],
)
