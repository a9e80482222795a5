"""Host NMS + rasterizers: ctypes bindings to the native C++ library.

The reference runs these as numba-JIT kernels after a device->host round-trip
(bev_depth_head.py:426-463); here they are C++ (csrc/vampire_host.cpp) built
on first use with g++, with pure-numpy fallbacks if no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), '..', 'csrc')
_LIB_PATH = os.path.join(_CSRC, 'libvampire_host.so')
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            src = os.path.join(_CSRC, 'vampire_host.cpp')
            # a prebuilt .so without sources (packaged tree) is fine as-is;
            # rebuild only when the source exists and is newer
            if not os.path.exists(_LIB_PATH) or (
                    os.path.exists(src)
                    and os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
                # build to a per-process temp name and move atomically:
                # forked data-loader workers can race on first use, and a
                # concurrently half-written .so must never be CDLL'd
                tmp = f'{_LIB_PATH}.{os.getpid()}'
                proc = subprocess.run(
                    ['make', '-C', _CSRC, f'OUT={os.path.basename(tmp)}'],
                    check=False, capture_output=True, text=True)
                if proc.returncode != 0 or not os.path.exists(tmp):
                    raise RuntimeError(
                        f'make failed (rc={proc.returncode}): '
                        f'{proc.stderr[-500:]}')
                os.replace(tmp, _LIB_PATH)
            lib = ctypes.CDLL(_LIB_PATH)
            f32p = ctypes.POINTER(ctypes.c_float)
            i32p = ctypes.POINTER(ctypes.c_int)
            lib.circle_nms.restype = ctypes.c_int
            lib.circle_nms.argtypes = [f32p, ctypes.c_int, ctypes.c_float,
                                       ctypes.c_int, i32p]
            lib.size_aware_circle_nms.restype = ctypes.c_int
            lib.size_aware_circle_nms.argtypes = [f32p, ctypes.c_int,
                                                  ctypes.c_float,
                                                  ctypes.c_int, i32p]
            lib.rotated_nms.restype = ctypes.c_int
            lib.rotated_nms.argtypes = [f32p, f32p, ctypes.c_int,
                                        ctypes.c_float, ctypes.c_int, i32p]
            lib.rasterize_depth.restype = None
            lib.rasterize_depth.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                            ctypes.c_int, f32p, f32p]
            lib.rasterize_bev.restype = None
            lib.rasterize_bev.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                          ctypes.c_int, f32p, f32p, f32p]
            _lib = lib
        except Exception as e:
            import sys
            print(f'vampire_host C++ library unavailable ({e}); '
                  f'using the (much slower) numpy fallbacks',
                  file=sys.stderr, flush=True)
            _build_failed = True
        return _lib


def _f32(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


def circle_nms(dets: np.ndarray, thresh: float,
               post_max_size: int = 83) -> np.ndarray:
    """dets: (N, 3) [x, y, score]; thresh compares squared distance.
    Returns kept indices (score-descending order)."""
    dets = _f32(dets)
    n = dets.shape[0]
    if n == 0:
        return np.zeros((0,), np.int64)
    lib = _load()
    if lib is not None:
        keep = np.zeros((post_max_size,), np.int32)
        cnt = lib.circle_nms(dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                             n, float(thresh), post_max_size,
                             keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return keep[:cnt].astype(np.int64)
    # numpy fallback (same algorithm)
    order = np.argsort(-dets[:, 2], kind='stable')
    suppressed = np.zeros(n, bool)
    keep = []
    for oi in range(n):
        i = order[oi]
        if suppressed[i]:
            continue
        keep.append(i)
        if len(keep) >= post_max_size:
            break
        d = dets[order[oi + 1:], :2] - dets[i, :2]
        close = (d ** 2).sum(-1) <= thresh
        suppressed[order[oi + 1:][close]] = True
    return np.asarray(keep[:post_max_size], np.int64)


def size_aware_circle_nms(dets: np.ndarray, thresh_scale: float,
                          post_max_size: int = 83) -> np.ndarray:
    """dets: (N, 6) [x, y, dx, dy, yaw, score] (bev_depth_head.py:33-82)."""
    dets = _f32(dets)
    n = dets.shape[0]
    if n == 0:
        return np.zeros((0,), np.int64)
    lib = _load()
    if lib is not None:
        keep = np.zeros((post_max_size,), np.int32)
        cnt = lib.size_aware_circle_nms(
            dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            float(thresh_scale), post_max_size,
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return keep[:cnt].astype(np.int64)
    order = np.argsort(-dets[:, 5], kind='stable')
    suppressed = np.zeros(n, bool)
    keep = []
    x, y, dx, dy, yaw = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    for oi in range(n):
        i = order[oi]
        if suppressed[i]:
            continue
        keep.append(i)
        if len(keep) >= post_max_size:
            break
        for oj in range(oi + 1, n):
            j = order[oj]
            if suppressed[j]:
                continue
            dist_x = abs(x[i] - x[j])
            dist_y = abs(y[i] - y[j])
            th_x = (abs(dx[i] * np.cos(yaw[i])) + abs(dx[j] * np.cos(yaw[j]))
                    + abs(dy[i] * np.sin(yaw[i])) + abs(dy[j] * np.sin(yaw[j])))
            th_y = (abs(dx[i] * np.sin(yaw[i])) + abs(dx[j] * np.sin(yaw[j]))
                    + abs(dy[i] * np.cos(yaw[i])) + abs(dy[j] * np.cos(yaw[j])))
            if dist_x <= th_x * thresh_scale / 2 and \
               dist_y <= th_y * thresh_scale / 2:
                suppressed[j] = True
    return np.asarray(keep[:post_max_size], np.int64)


def _rect_corners_np(boxes: np.ndarray) -> np.ndarray:
    """(N, 5) [cx, cy, w, h, yaw] -> (N, 4, 2) CCW corners."""
    c, s = np.cos(boxes[:, 4]), np.sin(boxes[:, 4])
    hw, hh = boxes[:, 2] / 2, boxes[:, 3] / 2
    dx = np.stack([-hw, hw, hw, -hw], 1)
    dy = np.stack([-hh, -hh, hh, hh], 1)
    x = boxes[:, 0:1] + dx * c[:, None] - dy * s[:, None]
    y = boxes[:, 1:2] + dx * s[:, None] + dy * c[:, None]
    return np.stack([x, y], -1)


def _rect_iou_np(b1: np.ndarray, b2: np.ndarray) -> float:
    """Rotated-rectangle IoU via Sutherland-Hodgman clipping (float64 —
    the C++ path computes in double, so the fallback must too for keep/
    suppress parity at IoU ~= thresh)."""
    poly = [tuple(p) for p in _rect_corners_np(b1[None].astype(np.float64))[0]]
    clipper = _rect_corners_np(b2[None].astype(np.float64))[0]
    for e in range(4):
        ax, ay = clipper[e]
        bx, by = clipper[(e + 1) % 4]
        out = []
        for i in range(len(poly)):
            cx, cy = poly[i]
            nx, ny = poly[(i + 1) % len(poly)]
            dc = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            dn = (bx - ax) * (ny - ay) - (by - ay) * (nx - ax)
            if dc >= 0:
                out.append((cx, cy))
            if (dc >= 0) != (dn >= 0):
                t = dc / (dc - dn)
                out.append((cx + t * (nx - cx), cy + t * (ny - cy)))
        poly = out
        if not poly:
            break
    inter = 0.0
    for i in range(len(poly)):
        x0, y0 = poly[i]
        x1, y1 = poly[(i + 1) % len(poly)]
        inter += x0 * y1 - x1 * y0
    inter = abs(inter) / 2
    union = float(b1[2]) * b1[3] + float(b2[2]) * b2[3] - inter
    return inter / union if union > 0 else 0.0


def rotated_nms(boxes: np.ndarray, scores: np.ndarray, thresh: float,
                post_max_size: int = 83) -> np.ndarray:
    """Greedy rotated-BEV-IoU NMS (mmdet3d `nms_gpu` semantics, the
    reference's nms_type='rotate' branch, bev_depth_head.py:473-475 —
    unused by every shipped config; provided for surface completeness).

    boxes: (N, 5) [cx, cy, w, h, yaw]; scores: (N,). Returns kept indices
    in score-descending order."""
    boxes = _f32(boxes)
    scores = _f32(scores)
    n = boxes.shape[0]
    if n == 0:
        return np.zeros((0,), np.int64)
    lib = _load()
    if lib is not None:
        keep = np.zeros((post_max_size,), np.int32)
        cnt = lib.rotated_nms(
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, float(thresh), post_max_size,
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return keep[:cnt].astype(np.int64)
    order = np.argsort(-scores, kind='stable')
    suppressed = np.zeros(n, bool)
    keep = []
    for oi in range(n):
        i = order[oi]
        if suppressed[i]:
            continue
        keep.append(i)
        if len(keep) >= post_max_size:
            break
        for oj in range(oi + 1, n):
            j = order[oj]
            if not suppressed[j] and _rect_iou_np(boxes[i], boxes[j]) > thresh:
                suppressed[j] = True
    return np.asarray(keep[:post_max_size], np.int64)


def rasterize_depth(uvdl: np.ndarray, h: int, w: int):
    """(N, 4) [u, v, depth, label] -> (depth (h, w), label (h, w)); nearest
    point wins (depth_transform, nusc_det_seg_dataset.py:178-231)."""
    uvdl = _f32(uvdl)
    depth = np.zeros((h, w), np.float32)
    label = np.zeros((h, w), np.float32)
    lib = _load()
    if lib is not None and uvdl.shape[0]:
        lib.rasterize_depth(
            uvdl.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            uvdl.shape[0], h, w,
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            label.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return depth, label
    if uvdl.shape[0]:
        order = np.argsort(-uvdl[:, 2], kind='stable')
        for k in order:
            u, v = int(uvdl[k, 0]), int(uvdl[k, 1])
            if 0 <= u < w and 0 <= v < h:
                depth[v, u] = uvdl[k, 2]
                label[v, u] = uvdl[k, 3]
    return depth, label


def rasterize_bev(xyzl: np.ndarray, gh: int, gw: int):
    """(N, 4) [ix, iy, z, label] -> (seg, height, mask) each (gh, gw);
    highest point wins (get_bev_seg_map, nusc_det_seg_dataset.py:233-265)."""
    xyzl = _f32(xyzl)
    seg = np.zeros((gh, gw), np.float32)
    height = np.zeros((gh, gw), np.float32)
    mask = np.zeros((gh, gw), np.float32)
    lib = _load()
    if lib is not None and xyzl.shape[0]:
        lib.rasterize_bev(
            xyzl.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            xyzl.shape[0], gh, gw,
            seg.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            height.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return seg, height, mask
    if xyzl.shape[0]:
        order = np.argsort(xyzl[:, 2], kind='stable')
        for k in order:
            ix, iy = int(xyzl[k, 0]), int(xyzl[k, 1])
            if 0 <= ix < gw and 0 <= iy < gh:
                seg[iy, ix] = xyzl[k, 3]
                height[iy, ix] = xyzl[k, 2]
                mask[iy, ix] = 1.0
    return seg, height, mask
