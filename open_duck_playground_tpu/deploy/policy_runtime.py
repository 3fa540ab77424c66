"""ctypes bindings for the native C++ policy runtime (deploy/cpp).

`CppOnnxPolicy` mirrors the OnnxInfer interface; `build()` compiles the
shared library with the system toolchain on first use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(__file__), "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libduck_policy.so")


def build(force: bool = False) -> str:
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _CPP_DIR], check=True, capture_output=True)
    return _LIB_PATH


class CppOnnxPolicy:
    def __init__(self, onnx_model_path: str):
        lib_path = build()
        lib = ctypes.CDLL(lib_path)
        lib.duck_policy_load.restype = ctypes.c_void_p
        lib.duck_policy_load.argtypes = [ctypes.c_char_p]
        lib.duck_policy_obs_size.restype = ctypes.c_int
        lib.duck_policy_obs_size.argtypes = [ctypes.c_void_p]
        lib.duck_policy_act_size.restype = ctypes.c_int
        lib.duck_policy_act_size.argtypes = [ctypes.c_void_p]
        lib.duck_policy_infer.restype = ctypes.c_int
        lib.duck_policy_infer.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.duck_policy_free.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self._h = lib.duck_policy_load(onnx_model_path.encode())
        if not self._h:
            raise RuntimeError(f"failed to load {onnx_model_path}")
        self.obs_size = lib.duck_policy_obs_size(self._h)
        self.act_size = lib.duck_policy_act_size(self._h)

    def infer(self, obs: np.ndarray) -> np.ndarray:
        obs = np.ascontiguousarray(obs, np.float32).ravel()
        out = np.zeros(self.act_size, np.float32)
        rc = self._lib.duck_policy_infer(
            self._h,
            obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            obs.size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.size,
        )
        if rc != 0:
            raise RuntimeError(f"duck_policy_infer failed with code {rc}")
        return out

    def __del__(self):
        try:
            self._lib.duck_policy_free(self._h)
        except Exception:
            pass
