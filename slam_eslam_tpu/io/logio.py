"""Python bindings for the native log runtime (ctypes over C ABI).

See ``native/eslam_log.cpp`` for the format and the asynchronous feeder
design.  Encoding/decoding of typed records happens here with NumPy
structured views — zero-copy on the read path (payload pointers map
straight into the mmap / feeder slots).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from slam_eslam_tpu.core.state import BodyContactState

CONTACT_STATE = 1
ORIENTATION = 2
LASER_SCAN = 3
POSE = 4
DISTANCE_IMAGE = 5
TEXTURE_IMAGE = 6

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libeslam_log.so")
_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)


def _build_native():
    subprocess.run(
        ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
    )


def _load():
    if not os.path.exists(_LIB_PATH):
        _build_native()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.eslam_log_writer_open.restype = ctypes.c_void_p
    lib.eslam_log_writer_open.argtypes = [ctypes.c_char_p]
    lib.eslam_log_writer_append.restype = ctypes.c_int
    lib.eslam_log_writer_append.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint64,
        ctypes.c_void_p, ctypes.c_uint32,
    ]
    lib.eslam_log_writer_close.argtypes = [ctypes.c_void_p]
    lib.eslam_log_reader_open.restype = ctypes.c_void_p
    lib.eslam_log_reader_open.argtypes = [ctypes.c_char_p]
    lib.eslam_log_reader_count.restype = ctypes.c_int64
    lib.eslam_log_reader_count.argtypes = [ctypes.c_void_p]
    lib.eslam_log_reader_get.restype = ctypes.c_void_p
    lib.eslam_log_reader_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.eslam_log_reader_close.argtypes = [ctypes.c_void_p]
    lib.eslam_feeder_create.restype = ctypes.c_void_p
    lib.eslam_feeder_create.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.eslam_feeder_next.restype = ctypes.c_void_p
    lib.eslam_feeder_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.eslam_feeder_destroy.argtypes = [ctypes.c_void_p]
    lib.eslam_log_reader_count_type.restype = ctypes.c_int64
    lib.eslam_log_reader_count_type.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32,
    ]
    lib.eslam_log_reader_select.restype = ctypes.c_int64
    lib.eslam_log_reader_select.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int64,
    ]
    lib.eslam_log_reader_gather.restype = ctypes.c_int
    lib.eslam_log_reader_gather.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.eslam_log_compact.restype = ctypes.c_int64
    lib.eslam_log_compact.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int32, ctypes.c_int64,
    ]
    return lib


_lib = None


def lib():
    global _lib
    if _lib is None:
        _lib = _load()
    return _lib


# ------------------------------------------------------------------ codecs

_CONTACT_DT = np.dtype(
    [("position", "<f4", 3), ("contact", "<f4"), ("slip", "<f4"),
     ("group_id", "<i4")]
)


def encode_contact_state(state: BodyContactState) -> bytes:
    c = state.c
    arr = np.empty(c, _CONTACT_DT)
    arr["position"] = np.asarray(state.position, np.float32)
    arr["contact"] = np.asarray(state.contact, np.float32)
    arr["slip"] = np.asarray(state.slip, np.float32)
    arr["group_id"] = np.asarray(state.group_id, np.int32)
    return np.uint32(c).tobytes() + arr.tobytes()


def decode_contact_state(buf) -> BodyContactState:
    c = int(np.frombuffer(buf[:4], np.uint32)[0])
    arr = np.frombuffer(buf[4:4 + c * _CONTACT_DT.itemsize], _CONTACT_DT)
    return BodyContactState.create(
        arr["position"].copy(), contact=arr["contact"].copy(),
        slip=arr["slip"].copy(), group_id=arr["group_id"].copy(),
    )


def encode_orientation(q) -> bytes:
    return np.asarray(q, np.float32).tobytes()


def decode_orientation(buf):
    return np.frombuffer(buf[:16], np.float32).copy()


def encode_scan(ranges, start_angle, angular_resolution) -> bytes:
    r = np.asarray(ranges, np.float32)
    return (np.uint32(r.size).tobytes()
            + np.float32(start_angle).tobytes()
            + np.float32(angular_resolution).tobytes() + r.tobytes())


def decode_scan(buf):
    n = int(np.frombuffer(buf[:4], np.uint32)[0])
    start = float(np.frombuffer(buf[4:8], np.float32)[0])
    res = float(np.frombuffer(buf[8:12], np.float32)[0])
    ranges = np.frombuffer(buf[12:12 + 4 * n], np.float32).copy()
    return ranges, start, res


def encode_pose(position, quat) -> bytes:
    return (np.asarray(position, np.float32).tobytes()
            + np.asarray(quat, np.float32).tobytes())


def decode_pose(buf):
    v = np.frombuffer(buf[:28], np.float32)
    return v[:3].copy(), v[3:7].copy()


def encode_distance_image(data, scale_x, scale_y, center_x,
                          center_y) -> bytes:
    """``mapping.projection.DistanceImage`` payload: u32 H, u32 W,
    4 f32 intrinsics, then H*W f32 distances."""
    d = np.asarray(data, np.float32)
    h, w = d.shape
    head = np.array([h, w], np.uint32).tobytes()
    intr = np.array([scale_x, scale_y, center_x, center_y],
                    np.float32).tobytes()
    return head + intr + d.tobytes()


def decode_distance_image(buf):
    """Returns ``(data [H, W], scale_x, scale_y, center_x, center_y)``."""
    h, w = (int(v) for v in np.frombuffer(buf[:8], np.uint32))
    intr = np.frombuffer(buf[8:24], np.float32)
    data = np.frombuffer(buf[24:24 + 4 * h * w], np.float32).reshape(h, w)
    return data.copy(), *(float(v) for v in intr)


def encode_texture_image(img) -> bytes:
    """RGB texture aligned with a distance image (the reference's
    ImageRGB24 camera input, ``EmbodiedSlamFilter.cpp:259-275``):
    u32 H, u32 W, then H*W*3 f32 in [0, 1]."""
    d = np.asarray(img, np.float32)
    h, w, c = d.shape
    assert c == 3, "texture must be [H, W, 3]"
    return np.array([h, w], np.uint32).tobytes() + d.tobytes()


def decode_texture_image(buf):
    h, w = (int(v) for v in np.frombuffer(buf[:8], np.uint32))
    return np.frombuffer(
        buf[8:8 + 12 * h * w], np.float32
    ).reshape(h, w, 3).copy()


# ------------------------------------------------------------------ API


class LogWriter:
    def __init__(self, path):
        self._h = lib().eslam_log_writer_open(str(path).encode())
        if not self._h:
            raise OSError(f"cannot open log for writing: {path}")

    def append(self, rec_type, payload: bytes, timestamp_ns=0):
        rc = lib().eslam_log_writer_append(
            self._h, rec_type, timestamp_ns, payload, len(payload)
        )
        if rc != 0:
            raise OSError("log append failed")

    def write_contact_state(self, state, timestamp_ns=0):
        self.append(CONTACT_STATE, encode_contact_state(state), timestamp_ns)

    def write_orientation(self, q, timestamp_ns=0):
        self.append(ORIENTATION, encode_orientation(q), timestamp_ns)

    def write_scan(self, ranges, start_angle, angular_resolution,
                   timestamp_ns=0):
        self.append(
            LASER_SCAN, encode_scan(ranges, start_angle, angular_resolution),
            timestamp_ns,
        )

    def write_pose(self, position, quat, timestamp_ns=0):
        self.append(POSE, encode_pose(position, quat), timestamp_ns)

    def write_distance_image(self, data, scale_x, scale_y, center_x,
                             center_y, timestamp_ns=0):
        self.append(
            DISTANCE_IMAGE,
            encode_distance_image(data, scale_x, scale_y, center_x,
                                  center_y),
            timestamp_ns,
        )

    def write_texture_image(self, img, timestamp_ns=0):
        self.append(TEXTURE_IMAGE, encode_texture_image(img), timestamp_ns)

    def close(self):
        if self._h:
            lib().eslam_log_writer_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def _payload_view(ptr, size):
    return ctypes.string_at(ptr, size)


class LogReader:
    def __init__(self, path):
        self._h = lib().eslam_log_reader_open(str(path).encode())
        if not self._h:
            raise OSError(f"cannot open log: {path}")

    def __len__(self):
        return int(lib().eslam_log_reader_count(self._h))

    def get(self, i):
        t = ctypes.c_uint32()
        ts = ctypes.c_uint64()
        sz = ctypes.c_uint32()
        ptr = lib().eslam_log_reader_get(
            self._h, i, ctypes.byref(t), ctypes.byref(ts), ctypes.byref(sz)
        )
        if not ptr:
            raise IndexError(i)
        return t.value, ts.value, _payload_view(ptr, sz.value)

    def count_type(self, rec_type):
        return int(lib().eslam_log_reader_count_type(self._h, rec_type))

    def select(self, rec_type):
        """Indices + timestamps of all records of one type (native
        scan; one call instead of a Python loop over the log)."""
        cap = len(self)
        idx = np.empty(cap, np.int64)
        ts = np.empty(cap, np.uint64)
        n = int(lib().eslam_log_reader_select(
            self._h, rec_type,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            cap,
        ))
        return idx[:n], ts[:n]

    def gather(self, idx, record_bytes):
        """Native strided gather of fixed-size payloads: one contiguous
        ``[n, record_bytes]`` uint8 buffer (single allocation, single
        downstream device transfer — the zero-copy feed path)."""
        idx = np.ascontiguousarray(idx, np.int64)
        out = np.empty((idx.size, record_bytes), np.uint8)
        rc = lib().eslam_log_reader_gather(
            self._h,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            idx.size, record_bytes,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != 0:
            raise ValueError("gather failed (bad record index)")
        return out

    def close(self):
        if self._h:
            lib().eslam_log_reader_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def compact(src, dst, types=(), stride=1):
    """Rewrite a log keeping only ``types`` (empty = all) and every
    ``stride``-th record per type.  Returns the record count written."""
    arr = np.asarray(list(types), np.uint32)
    n = int(lib().eslam_log_compact(
        str(src).encode(), str(dst).encode(),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        arr.size, stride,
    ))
    if n < 0:
        raise OSError(f"compaction failed: {src} -> {dst}")
    return n


def load_stream(path):
    """Batch-load a whole recorded traverse as stacked arrays — the
    input shape of ``filter.streaming.make_slam_scan_runner``.

    Uses the native select+gather entry points: the per-record work
    (type filter, payload copy) happens in C; Python does exactly one
    ``frombuffer``+reshape per record type.  Frame pairing follows the
    recording convention (one contact + orientation [+ pose] per frame,
    equal timestamps; scans attach to the closest preceding frame).

    Returns a dict with ``contact`` (structured [T, C]), ``orientation``
    [T, 4], ``pose`` [T, 7] or None, ``scan_ranges`` [T, R],
    ``scan_meta`` (start, resolution), ``has_scan`` [T], ``dimg``
    [T, H, W] or None, ``dimg_meta`` (scale_x, scale_y, center_x,
    center_y), ``has_dimg`` [T], ``ts`` [T].
    """
    with LogReader(path) as r:
        cidx, cts = r.select(CONTACT_STATE)
        if cidx.size == 0:
            raise ValueError(f"no contact states in {path}")
        # all contact records must share C (fixed-shape trajectory)
        _, _, first = r.get(int(cidx[0]))
        c = int(np.frombuffer(bytes(first[:4]), np.uint32)[0])
        rec_bytes = 4 + c * _CONTACT_DT.itemsize
        raw = r.gather(cidx, rec_bytes)
        contact = np.frombuffer(
            raw[:, 4:].tobytes(), _CONTACT_DT
        ).reshape(cidx.size, c)

        # every contact record must share C — a mismatched record would be
        # silently truncated / zero-padded by the fixed-stride C gather
        counts = np.frombuffer(
            r.gather(cidx, 4).tobytes(), np.uint32
        )
        if not (counts == c).all():
            bad = int(np.nonzero(counts != c)[0][0])
            raise ValueError(
                f"contact record {bad} has {int(counts[bad])} points, "
                f"expected {c} (fixed-shape streams need a uniform count)"
            )

        oidx, _ = r.select(ORIENTATION)
        if oidx.size and oidx.size != cidx.size:
            raise ValueError(
                f"log violates the one-record-per-frame convention: "
                f"{oidx.size} orientation records vs {cidx.size} contact "
                "frames (frames would silently misalign)"
            )
        orientation = (
            np.frombuffer(r.gather(oidx, 16).tobytes(), np.float32)
            .reshape(-1, 4)
            if oidx.size else None
        )
        pidx, _ = r.select(POSE)
        if pidx.size and pidx.size != cidx.size:
            raise ValueError(
                f"log violates the one-record-per-frame convention: "
                f"{pidx.size} pose records vs {cidx.size} contact frames"
            )
        pose = (
            np.frombuffer(r.gather(pidx, 28).tobytes(), np.float32)
            .reshape(-1, 7)
            if pidx.size else None
        )

        sidx, sts = r.select(LASER_SCAN)
        t = cidx.size
        scan_ranges = None
        scan_meta = None
        has_scan = np.zeros((t,), bool)
        if sidx.size:
            _, _, sbuf = r.get(int(sidx[0]))
            n_rays = int(np.frombuffer(bytes(sbuf[:4]), np.uint32)[0])
            ray_counts = np.frombuffer(
                r.gather(sidx, 4).tobytes(), np.uint32
            )
            if not (ray_counts == n_rays).all():
                bad = int(np.nonzero(ray_counts != n_rays)[0][0])
                raise ValueError(
                    f"scan record {bad} has {int(ray_counts[bad])} rays, "
                    f"expected {n_rays} (the fixed-stride gather would "
                    "silently truncate or zero-pad it)"
                )
            srec = 12 + 4 * n_rays
            sraw = r.gather(sidx, srec)
            meta = np.frombuffer(sraw[:, 4:12].tobytes(),
                                 np.float32).reshape(-1, 2)
            scan_meta = (float(meta[0, 0]), float(meta[0, 1]))
            ranges = np.frombuffer(
                sraw[:, 12:].tobytes(), np.float32
            ).reshape(-1, n_rays)
            scan_ranges = np.zeros((t, n_rays), np.float32)
            # attach each scan to the closest preceding contact frame
            fi = np.searchsorted(cts, sts, side="right") - 1
            fi = np.clip(fi, 0, t - 1)
            if np.unique(fi).size != fi.size:
                import warnings

                warnings.warn(
                    "multiple scans map to the same contact frame; "
                    "earlier scans of a frame are dropped "
                    "(last-writer-wins)",
                    stacklevel=2,
                )
            scan_ranges[fi] = ranges
            has_scan[fi] = True

        didx, dts = r.select(DISTANCE_IMAGE)
        dimg = None
        dimg_meta = None
        has_dimg = np.zeros((t,), bool)
        if didx.size:
            _, _, dbuf = r.get(int(didx[0]))
            h, w = (int(v) for v in np.frombuffer(bytes(dbuf[:8]),
                                                  np.uint32))
            dims = np.frombuffer(
                r.gather(didx, 8).tobytes(), np.uint32
            ).reshape(-1, 2)
            if not ((dims[:, 0] == h) & (dims[:, 1] == w)).all():
                bad = int(np.nonzero(
                    (dims[:, 0] != h) | (dims[:, 1] != w)
                )[0][0])
                raise ValueError(
                    f"distance image {bad} is {tuple(dims[bad])}, "
                    f"expected {(h, w)} (fixed-shape streams need one "
                    "image geometry)"
                )
            drec = 24 + 4 * h * w
            draw = r.gather(didx, drec)
            intr = np.frombuffer(draw[:, 8:24].tobytes(),
                                 np.float32).reshape(-1, 4)
            dimg_meta = tuple(float(v) for v in intr[0])
            imgs = np.frombuffer(
                draw[:, 24:].tobytes(), np.float32
            ).reshape(-1, h, w)
            dimg = np.zeros((t, h, w), np.float32)
            fi = np.clip(
                np.searchsorted(cts, dts, side="right") - 1, 0, t - 1
            )
            if np.unique(fi).size != fi.size:
                import warnings

                warnings.warn(
                    "multiple distance images map to the same contact "
                    "frame; earlier ones are dropped (last-writer-wins)",
                    stacklevel=2,
                )
            dimg[fi] = imgs
            has_dimg[fi] = True

        tidx, tts = r.select(TEXTURE_IMAGE)
        timg = None
        if tidx.size:
            _, _, tbuf = r.get(int(tidx[0]))
            th, tw = (int(v) for v in np.frombuffer(bytes(tbuf[:8]),
                                                    np.uint32))
            tdims = np.frombuffer(
                r.gather(tidx, 8).tobytes(), np.uint32
            ).reshape(-1, 2)
            if not ((tdims[:, 0] == th) & (tdims[:, 1] == tw)).all():
                raise ValueError(
                    "texture images must share one geometry "
                    "(fixed-shape streams)"
                )
            traw = r.gather(tidx, 8 + 12 * th * tw)
            imgs_t = np.frombuffer(
                traw[:, 8:].tobytes(), np.float32
            ).reshape(-1, th, tw, 3)
            timg = np.zeros((t, th, tw, 3), np.float32)
            fi = np.clip(
                np.searchsorted(cts, tts, side="right") - 1, 0, t - 1
            )
            timg[fi] = imgs_t

    return {
        "contact": contact,
        "orientation": orientation,
        "pose": pose,
        "scan_ranges": scan_ranges,
        "scan_meta": scan_meta,
        "has_scan": has_scan,
        "dimg": dimg,
        "dimg_meta": dimg_meta,
        "has_dimg": has_dimg,
        "timg": timg,
        "ts": cts,
    }


class AsyncFeeder:
    """Background-prefetched sequential reads (see C side)."""

    def __init__(self, reader: LogReader, slots=8):
        self._reader = reader
        self._h = lib().eslam_feeder_create(reader._h, slots)
        if not self._h:
            raise OSError("feeder creation failed")

    def __iter__(self):
        return self

    def __next__(self):
        t = ctypes.c_uint32()
        ts = ctypes.c_uint64()
        sz = ctypes.c_uint32()
        ptr = lib().eslam_feeder_next(
            self._h, ctypes.byref(t), ctypes.byref(ts), ctypes.byref(sz)
        )
        if not ptr:
            raise StopIteration
        return t.value, ts.value, _payload_view(ptr, sz.value)

    def close(self):
        if self._h:
            lib().eslam_feeder_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
