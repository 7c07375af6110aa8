"""ctypes bindings for the frtm_native host library (native/frtm_native.cpp):
affine warps, multithreaded JPEG decode, and indexed PNG IO.

Auto-builds the .so on first use (mirroring the reference's JIT-compiled
extension at lib/_npp/__init__.py:16, but with a cached shared object) and
degrades gracefully — callers fall back to cv2/PIL when unavailable."""
import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO = _NATIVE_DIR / "libfrtm_native.so"
_lib = None
_tried = False

WARP_MODES = {"nearest": 0, "bilinear": 1, "bicubic": 2}


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists():
            print("Compiling frtm_native extension...")
            subprocess.run(["bash", str(_NATIVE_DIR / "build.sh")], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.warp_affine_f32.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int, f64p, f32p, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.warp_affine_f32.restype = ctypes.c_int
        lib.filter2d_f32.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, f32p, ctypes.c_int,
                                     ctypes.c_int, f32p]
        lib.filter2d_f32.restype = ctypes.c_int
        lib.jpeg_dims.argtypes = [u8p, ctypes.c_long,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
        lib.jpeg_dims.restype = ctypes.c_int
        lib.decode_jpeg.argtypes = [u8p, ctypes.c_long, u8p, ctypes.c_int,
                                    ctypes.c_int]
        lib.decode_jpeg.restype = ctypes.c_int
        lib.batch_decode_jpeg_files.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, u8p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.batch_decode_jpeg_files.restype = ctypes.c_int
        lib.png_dims.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
        lib.png_dims.restype = ctypes.c_int
        lib.read_png_index.argtypes = [ctypes.c_char_p, u8p, ctypes.c_int,
                                       ctypes.c_int]
        lib.read_png_index.restype = ctypes.c_int
        lib.write_png_indexed.argtypes = [ctypes.c_char_p, u8p, ctypes.c_int,
                                          ctypes.c_int, u8p]
        lib.write_png_indexed.restype = ctypes.c_int
        _lib = lib
    except Exception as e:  # missing toolchain/libs: fall back to cv2/PIL
        print(f"frtm_native unavailable ({e}); using Python fallbacks.")
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _fp(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def warp_affine(src: np.ndarray, H: np.ndarray, size, mode="bicubic",
                n_threads: int = 4) -> np.ndarray:
    """(H, W, C<=8) float32 affine warp with the forward 3x3 matrix."""
    lib = _load()
    assert lib is not None
    src = np.ascontiguousarray(np.atleast_3d(src), np.float32)
    H3 = np.eye(3)
    H3[:np.asarray(H).shape[0]] = np.asarray(H, np.float64)[:3]
    H3 = np.ascontiguousarray(H3, np.float64)
    out = np.empty((int(size[0]), int(size[1]), src.shape[2]), np.float32)
    rc = lib.warp_affine_f32(_fp(src, ctypes.c_float), src.shape[0], src.shape[1],
                             src.shape[2], _fp(H3, ctypes.c_double),
                             _fp(out, ctypes.c_float), out.shape[0], out.shape[1],
                             WARP_MODES[mode], n_threads)
    if rc != 0:
        raise RuntimeError(f"warp_affine_f32 failed: {rc}")
    return out


def filter2d(src: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """cv2.filter2D-equivalent correlation (center anchor, zero padding) on
    (H, W, C) float32."""
    lib = _load()
    assert lib is not None
    src = np.ascontiguousarray(np.atleast_3d(src), np.float32)
    kernel = np.ascontiguousarray(kernel, np.float32)
    out = np.empty_like(src)
    rc = lib.filter2d_f32(_fp(src, ctypes.c_float), src.shape[0], src.shape[1],
                          src.shape[2], _fp(kernel, ctypes.c_float),
                          kernel.shape[0], kernel.shape[1],
                          _fp(out, ctypes.c_float))
    if rc != 0:
        raise RuntimeError(f"filter2d_f32 failed: {rc}")
    return out


def decode_jpeg_file(path) -> np.ndarray:
    lib = _load()
    assert lib is not None
    buf = np.frombuffer(open(path, "rb").read(), np.uint8)
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.jpeg_dims(_fp(buf, ctypes.c_uint8), len(buf), ctypes.byref(h),
                     ctypes.byref(w)) != 0:
        raise RuntimeError(f"jpeg_dims failed for {path}")
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.decode_jpeg(_fp(buf, ctypes.c_uint8), len(buf),
                       _fp(out, ctypes.c_uint8), h.value, w.value) != 0:
        raise RuntimeError(f"decode_jpeg failed for {path}")
    return out


def batch_decode_jpeg_files(paths, h, w, n_threads: int = 8) -> np.ndarray:
    """Decode n same-size JPEGs in parallel -> (n, h, w, 3) uint8."""
    lib = _load()
    assert lib is not None
    n = len(paths)
    out = np.empty((n, h, w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    ok = lib.batch_decode_jpeg_files(arr, n, _fp(out, ctypes.c_uint8), h, w,
                                     n_threads)
    if ok != n:
        raise RuntimeError(f"batch decode: {ok}/{n} succeeded")
    return out


def read_png_index(path) -> np.ndarray:
    lib = _load()
    assert lib is not None
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.png_dims(str(path).encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        raise RuntimeError(f"png_dims failed for {path}")
    out = np.empty((h.value, w.value), np.uint8)
    if lib.read_png_index(str(path).encode(), _fp(out, ctypes.c_uint8),
                          h.value, w.value) != 0:
        raise RuntimeError(f"read_png_index failed for {path}")
    return out


def write_png_indexed(path, data: np.ndarray, palette: np.ndarray):
    lib = _load()
    assert lib is not None
    data = np.ascontiguousarray(np.asarray(data, np.uint8).squeeze())
    palette = np.ascontiguousarray(np.asarray(palette, np.uint8).reshape(256, 3))
    if lib.write_png_indexed(str(path).encode(), _fp(data, ctypes.c_uint8),
                             data.shape[0], data.shape[1],
                             _fp(palette, ctypes.c_uint8)) != 0:
        raise RuntimeError(f"write_png_indexed failed for {path}")
