"""ctypes bindings for the native host runtime (snuffy_native.cpp).

Auto-builds `libsnuffy_native.so` with g++ on first use (libtiff + libjpeg,
both in the base image). Every entry point degrades gracefully: callers
check `available()` and fall back to PIL/pandas paths when the toolchain or
libraries are absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "snuffy_native.cpp")
_SO = os.path.join(_HERE, "libsnuffy_native.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
        "-I/usr/include/x86_64-linux-gnu",
        _SRC, "-o", _SO, "-ltiff", "-ljpeg",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _build_failed = True
        return None

    lib.slide_open.restype = ctypes.c_void_p
    lib.slide_open.argtypes = [ctypes.c_char_p]
    lib.slide_level_count.restype = ctypes.c_int
    lib.slide_level_count.argtypes = [ctypes.c_void_p]
    lib.slide_level_dimensions.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.slide_level_downsample.restype = ctypes.c_double
    lib.slide_level_downsample.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.slide_spacing_um.restype = ctypes.c_double
    lib.slide_spacing_um.argtypes = [ctypes.c_void_p]
    lib.slide_read_region.restype = ctypes.c_int
    lib.slide_read_region.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.slide_read_label_region.restype = ctypes.c_int
    lib.slide_read_label_region.argtypes = lib.slide_read_region.argtypes
    lib.slide_close.argtypes = [ctypes.c_void_p]
    lib.jpeg_write_rgb.restype = ctypes.c_int
    lib.jpeg_write_rgb.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.parse_float_csv.restype = ctypes.c_int
    lib.parse_float_csv.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.tiff_write_tiled_rgb.restype = ctypes.c_int
    lib.tiff_write_tiled_rgb.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.tiff_write_tiled_gray.restype = ctypes.c_int
    lib.tiff_write_tiled_gray.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_int, ctypes.c_double,
    ]
    lib.slide_page_spacing_um.restype = ctypes.c_double
    lib.slide_page_spacing_um.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.slide_read_grid.restype = ctypes.c_int
    lib.slide_read_grid.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
    ]
    lib.slide_grid_jpeg_scaled_ok.restype = ctypes.c_int
    lib.slide_grid_jpeg_scaled_ok.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint32,
    ]
    lib.slide_read_grid_jpeg_scaled.restype = ctypes.c_int
    lib.slide_read_grid_jpeg_scaled.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


class NativeSlide:
    """Pyramidal TIFF reader — the OpenSlide/ASAP replacement.

    API mirrors what froc.py / the tiler need: level_count,
    level_dimensions, level_downsample, spacing_um, read_region (RGB) and
    read_label_region (uint8 label plane).
    """

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.slide_open(path.encode())
        if not self._h:
            raise FileNotFoundError(f"cannot open slide {path}")

    @property
    def level_count(self) -> int:
        return self._lib.slide_level_count(self._h)

    def level_dimensions(self, level: int) -> Tuple[int, int]:
        w = ctypes.c_uint32()
        h = ctypes.c_uint32()
        self._lib.slide_level_dimensions(self._h, level, ctypes.byref(w),
                                         ctypes.byref(h))
        return int(w.value), int(h.value)

    def level_downsample(self, level: int) -> float:
        return float(self._lib.slide_level_downsample(self._h, level))

    @property
    def spacing_um(self) -> float:
        return float(self._lib.slide_spacing_um(self._h))

    def read_region(self, level: int, x: int, y: int, w: int, h: int
                    ) -> np.ndarray:
        out = np.empty((h, w, 3), np.uint8)
        rc = self._lib.slide_read_region(
            self._h, level, x, y, w, h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != 0:
            raise IOError(f"slide_read_region failed rc={rc}")
        return out

    def read_label_region(self, level: int, x: int, y: int, w: int, h: int
                          ) -> np.ndarray:
        out = np.empty((h, w), np.uint8)
        rc = self._lib.slide_read_label_region(
            self._h, level, x, y, w, h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != 0:
            raise IOError(f"slide_read_label_region failed rc={rc}")
        return out

    def read_grid(self, level: int, read: int, n_cols: int, n_rows: int,
                  row0: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        """Decode an (n_rows, n_cols) tile-grid block starting at grid row
        `row0` in ONE native call → ((n_rows·n_cols, read, read, 3) uint8
        tiles in row-scan order, (n_rows·n_cols,) float32 edge energies).
        The batch path of the fused inference pipeline: per-tile JPEG
        decode, RGBA→RGB and the background-filter Laplacian all stay in
        C; block-wise calls overlap with async device embedding."""
        n = n_rows * n_cols
        tiles = np.empty((n, read, read, 3), np.uint8)
        energy = np.empty((n,), np.float32)
        rc = self._lib.slide_read_grid(
            self._h, level, read, row0, n_cols, n_rows,
            tiles.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            energy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise IOError(f"slide_read_grid failed rc={rc}")
        return tiles, energy

    @staticmethod
    def scale_num_for(read: int, out_side: int) -> Optional[int]:
        """The libjpeg scale numerator M (denominator 8) that decodes a
        `read`² JPEG tile directly at `out_side`², or None when out_side
        is not an exact M/8 fraction of read (256→224 gives M=7)."""
        if read <= 0 or not (0 < out_side <= 2 * read):
            return None
        num = out_side * 8
        if num % read:
            return None
        m = num // read
        return m if 1 <= m <= 16 and (read * m + 7) // 8 == out_side else None

    def scaled_grid_ok(self, level: int, read: int, out_side: int) -> bool:
        """True iff read_grid_scaled can serve this level: JPEG-tiled with
        side `read`, and out_side is an exact M/8 scale of it."""
        return (self.scale_num_for(read, out_side) is not None
                and bool(self._lib.slide_grid_jpeg_scaled_ok(
                    self._h, level, read)))

    def read_grid_scaled(self, level: int, read: int, n_cols: int,
                         n_rows: int, row0: int, out_side: int
                         ) -> Tuple[np.ndarray, np.ndarray]:
        """slide_read_grid with libjpeg M/8 scaled IDCT decode: raw JPEG
        tile bytes (+ the directory's shared JPEGTables) bypass libtiff's
        codec and decode DIRECTLY at out_side² — for the 256-tile → 224-
        embedder pipeline this deletes ~23% of decode work and upload
        bytes plus the whole device-side resize (VERDICT r3 item 2). The
        edge energies are computed at out_side (thresholds calibrated at
        `read` apply approximately; the 7/8 IDCT drops only the top
        frequency band)."""
        m = self.scale_num_for(read, out_side)
        if m is None:
            raise ValueError(f"{out_side} is not an M/8 scale of {read}")
        n = n_rows * n_cols
        tiles = np.empty((n, out_side, out_side, 3), np.uint8)
        energy = np.empty((n,), np.float32)
        rc = self._lib.slide_read_grid_jpeg_scaled(
            self._h, level, read, row0, n_cols, n_rows, m,
            tiles.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            energy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise IOError(f"slide_read_grid_jpeg_scaled failed rc={rc}")
        return tiles, energy

    def page_spacing_um(self, level: int) -> float:
        """µm/px from THAT page's resolution tags (0 when absent)."""
        return float(self._lib.slide_page_spacing_um(self._h, level))

    def close(self):
        if self._h:
            self._lib.slide_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def jpeg_write(path: str, rgb: np.ndarray, quality: int = 75) -> None:
    lib = get_lib()
    rgb = np.ascontiguousarray(rgb, np.uint8)
    if lib is None:
        from PIL import Image

        Image.fromarray(rgb).save(path, quality=quality)
        return
    rc = lib.jpeg_write_rgb(
        path.encode(), rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rgb.shape[1], rgb.shape[0], quality,
    )
    if rc != 0:
        raise IOError(f"jpeg_write_rgb failed rc={rc}")


def parse_bag_csv_fast(path: str, max_rows: int = 65536,
                       max_cols: int = 4096) -> Optional[np.ndarray]:
    """Numeric CSV → float32 (rows, cols); None when the library is absent.
    The caller slices off trailing label/position columns by schema."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros((max_rows, max_cols), np.float32)
    n_cols = ctypes.c_int()
    rows = lib.parse_float_csv(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_rows, max_cols, ctypes.byref(n_cols), 1,
    )
    if rows < 0:
        return None
    return out[:rows, : n_cols.value].copy()


def write_tiled_tiff_gray(path: str, levels, tile: int = 64,
                          spacing_um: float = 0.0) -> None:
    """Write a multi-page single-channel label TIFF from (H, W) uint8 arrays
    (level 0 first) — a realistic stand-in for CAMELYON16 mask TIFs:
    lossless, tiled, with per-page resolution tags derived from
    spacing_um × (that page's actual downsample ratio)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    w0 = None
    for i, arr in enumerate(levels):
        arr = np.ascontiguousarray(arr, np.uint8)
        if arr.ndim != 2:
            raise ValueError("gray levels must be (H, W)")
        if w0 is None:
            w0 = arr.shape[1]
        res_per_cm = 0.0
        if spacing_um > 0:
            page_spacing = spacing_um * (w0 / arr.shape[1])
            res_per_cm = 10_000.0 / page_spacing  # px per cm
        rc = lib.tiff_write_tiled_gray(
            path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            arr.shape[1], arr.shape[0], tile, 1 if i else 0, res_per_cm,
        )
        if rc != 0:
            raise IOError(f"tiff_write_tiled_gray failed rc={rc}")


def write_tiled_tiff(path: str, levels, tile: int = 256,
                     jpeg_quality: int = 75) -> None:
    """Write a tiled pyramidal TIFF from a list of (H, W, 3) uint8 arrays
    (level 0 first). Tiled layout keeps region reads O(region), which is
    what real scanner WSIs use — synthetic fixtures should match."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    for i, arr in enumerate(levels):
        arr = np.ascontiguousarray(arr, np.uint8)
        rc = lib.tiff_write_tiled_rgb(
            path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            arr.shape[1], arr.shape[0], tile, 1 if i else 0, jpeg_quality,
        )
        if rc != 0:
            raise IOError(f"tiff_write_tiled_rgb failed rc={rc}")
