"""Build hooks for the native C++ runtime.

The C ABI library (native/lancedb_native.cpp — FTS builder, DAAT BM25
scorers, hash join, suffix array, varint codecs) is compiled as an
extension-shaped shared object that the ctypes loader in
lancedb_tpu/native/__init__.py picks up. The build is OPTIONAL: without
a C++ toolchain the package installs pure-Python and every native
consumer falls back (slower, same behavior) — mirroring the
reference's optional fp16kernels/native features.
"""

from setuptools import setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    def run(self):
        try:
            super().run()
        except Exception as e:  # no compiler: install pure-python
            print(f"lancedb-tpu: skipping native build ({e}); "
                  "pure-Python fallbacks will be used")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:
            print(f"lancedb-tpu: skipping {ext.name} ({e})")


def _ext():
    from setuptools import Extension

    return Extension(
        "lancedb_tpu.native._liblancedb_native",
        sources=["native/lancedb_native.cpp"],
        extra_compile_args=["-O3", "-std=c++17"],
        optional=True,
    )


setup(ext_modules=[_ext()], cmdclass={"build_ext": OptionalBuildExt})
