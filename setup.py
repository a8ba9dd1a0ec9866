"""Build script: pure-Python package + optional native I/O extension."""

from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "lbm_tpu._native.lbmio",
            sources=["lbm_tpu/_native/lbmio.c"],
            extra_compile_args=["-O2", "-Wall"],
            optional=True,  # pure-Python fallbacks exist
        )
    ]
)
