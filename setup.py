"""Build hooks for the optional native wav loader.

The metadata lives in pyproject.toml; this file only adds the C++
extension build for csrc/wavio.cpp (the reference outsourced wav IO to
librosa/soundfile, reference: dataloader.py:34-37).  The extension is a
plain shared library loaded with ctypes — it exports C symbols, not a
Python module — and the build is best-effort: the package falls back to
the pure-numpy decoder (nelegan_tpu/data/wavio.py) when no compiler is
available, so a failed native build must not fail the install.
"""
import os

from setuptools import setup, Extension
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    def run(self):
        try:
            super().run()
        except Exception as e:  # no compiler / unsupported platform
            print(f"warning: skipping native wavio build ({e}); "
                  "the numpy wav fallback will be used")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:
            print(f"warning: skipping {ext.name} ({e})")


ext = Extension(
    # dotted name places the artifact next to nelegan_tpu/data/wavio.py,
    # which looks for it after the in-repo csrc/libwavio.so
    "nelegan_tpu.data._wavio_native",
    sources=[os.path.join("csrc", "wavio.cpp")],
    extra_compile_args=["-O2", "-std=c++17"],
    extra_link_args=["-lpthread"],
    optional=True,
)

setup(ext_modules=[ext], cmdclass={"build_ext": OptionalBuildExt})
