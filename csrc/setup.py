"""Build the wl_native C extension: python csrc/setup.py build_ext --inplace
(or `make native` from the repo root). Installed next to the package; all
call sites degrade gracefully to pure Python when it is absent."""

import os

from setuptools import Extension, setup

setup(
    name="wl_native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "wl_native",
            sources=[os.path.join(os.path.dirname(__file__), "wl_native.cpp")],
            extra_compile_args=["-O3", "-std=c++17"],
        )
    ],
)
