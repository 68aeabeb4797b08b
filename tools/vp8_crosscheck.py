#!/usr/bin/env python3
"""Cross-check graft.scale.Vp8 against the system libwebp (the reference
VP8 implementation), in both directions:

  1. repo encoder -> libwebp decoder: every fixture bitstream
     Vp8Crosscheck `gen` wrote must decode in libwebp to EXACTLY the luma
     plane the repo decoder produced (byte equality). This certifies the
     encoder emits spec-valid VP8 and that both decoders agree on it.
  2. libwebp encoder -> repo decoder: encode the same sources with the
     real encoder (advanced API; methods/qualities exercise B_PRED,
     segmentation, and skip paths; filter strengths 0-100, both filter
     types, and sharpness exercise the in-loop deblocker), then require
     the repo decoder's luma (Vp8Crosscheck `dec`) to equal libwebp's own
     decode.

Usage:
  sbt -batch "runMain graft.Vp8Crosscheck gen /tmp/vp8check"
  python3 tools/vp8_crosscheck.py /tmp/vp8check          # phase 1 + write r_*.webp
  sbt -batch "runMain graft.Vp8Crosscheck dec /tmp/vp8check"
  python3 tools/vp8_crosscheck.py /tmp/vp8check --phase2 # compare r_*.gray
"""
import ctypes
import glob
import os
import struct
import sys

lib = ctypes.CDLL("libwebp.so.7")

lib.WebPGetInfo.restype = ctypes.c_int
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPFree.argtypes = [ctypes.c_void_p]


def webp_decode_y(data: bytes):
    """libwebp's luma plane for a WebP bitstream, or None."""
    w = ctypes.c_int()
    h = ctypes.c_int()
    if not lib.WebPGetInfo(data, len(data), ctypes.byref(w), ctypes.byref(h)):
        return None
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    if not y:
        return None
    out = bytearray(w.value * h.value)
    for row in range(h.value):
        src = ctypes.string_at(
            ctypes.addressof(y.contents) + row * stride.value, w.value)
        out[row * w.value:(row + 1) * w.value] = src
    lib.WebPFree(y)
    return w.value, h.value, bytes(out)


# ---- advanced encoder API via ctypes (WebPConfig + WebPPicture) ------------

class WebPConfig(ctypes.Structure):
    _fields_ = [
        ("lossless", ctypes.c_int), ("quality", ctypes.c_float),
        ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int), ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int), ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int), ("preprocessing", ctypes.c_int),
        ("partitions", ctypes.c_int), ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int), ("thread_level", ctypes.c_int),
        ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
        ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
        ("qmax", ctypes.c_int)]


WRITER = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                          ctypes.c_size_t, ctypes.c_void_p)


class WebPPicture(ctypes.Structure):
    _fields_ = [
        ("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("y", ctypes.POINTER(ctypes.c_uint8)),
        ("u", ctypes.POINTER(ctypes.c_uint8)),
        ("v", ctypes.POINTER(ctypes.c_uint8)),
        ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
        ("a", ctypes.POINTER(ctypes.c_uint8)), ("a_stride", ctypes.c_int),
        ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.POINTER(ctypes.c_uint32)), ("argb_stride", ctypes.c_int),
        ("pad2", ctypes.c_uint32 * 3),
        ("writer", WRITER), ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int),
        ("extra_info", ctypes.POINTER(ctypes.c_uint8)),
        ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p), ("user_data", ctypes.c_void_p),
        ("pad3", ctypes.c_uint32 * 3),
        ("pad4", ctypes.c_void_p), ("pad5", ctypes.c_void_p),
        ("pad6", ctypes.c_uint32 * 8),
        # private (managed by WebPPictureAlloc/Free — must be present or
        # Alloc writes past the struct)
        ("memory_", ctypes.c_void_p), ("memory_argb_", ctypes.c_void_p),
        ("pad7", ctypes.c_void_p * 2)]


def probe_abi():
    cfg = WebPConfig()
    for ver in range(0x0220, 0x01ff, -1):
        if lib.WebPConfigInitInternal(ctypes.byref(cfg), 0,
                                      ctypes.c_float(75.0), ver):
            return ver
    raise SystemExit("no WebP encoder ABI version accepted")


def libwebp_encode_gray(pixels: bytes, w: int, h: int, quality: float,
                        method: int, segments: int, ver: int,
                        filter_strength: int = 0, filter_type: int = 1,
                        sharpness: int = 0, partitions: int = 0) -> bytes:
    cfg = WebPConfig()
    assert lib.WebPConfigInitInternal(ctypes.byref(cfg), 0,
                                      ctypes.c_float(quality), ver)
    cfg.filter_strength = filter_strength
    cfg.filter_sharpness = sharpness
    cfg.filter_type = filter_type
    cfg.autofilter = 0
    cfg.method = method
    cfg.segments = segments
    cfg.partitions = partitions
    pic = WebPPicture()
    assert lib.WebPPictureInitInternal(ctypes.byref(pic), ver)
    pic.width = w
    pic.height = h
    pic.use_argb = 0
    assert lib.WebPPictureAlloc(ctypes.byref(pic))
    for row in range(h):
        ctypes.memmove(ctypes.addressof(pic.y.contents) + row * pic.y_stride,
                       pixels[row * w:(row + 1) * w], w)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    for row in range(ch):
        ctypes.memset(ctypes.addressof(pic.u.contents) + row * pic.uv_stride,
                      128, cw)
        ctypes.memset(ctypes.addressof(pic.v.contents) + row * pic.uv_stride,
                      128, cw)
    chunks = []

    @WRITER
    def writer(data, size, _):
        chunks.append(ctypes.string_at(data, size))
        return 1

    pic.writer = writer
    ok = lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    err = pic.error_code
    lib.WebPPictureFree(ctypes.byref(pic))
    if not ok:
        raise SystemExit(f"WebPEncode failed, error_code={err}")
    return b"".join(chunks)


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vp8check"
    phase2 = "--phase2" in sys.argv
    fails = 0

    if not phase2:
        # phase 1: repo encoder -> libwebp decoder, byte-equal luma
        for f in sorted(glob.glob(os.path.join(d, "*.webp"))):
            name = os.path.basename(f)[:-5]
            if name.startswith("r_"):
                continue
            data = open(f, "rb").read()
            got = webp_decode_y(data)
            mine = open(os.path.join(d, name + ".gray"), "rb").read()
            if got is None:
                print(f"FAIL {name}: libwebp rejected the bitstream")
                fails += 1
                continue
            w, h, y = got
            if y != mine:
                diff = sum(1 for a, b in zip(y, mine) if a != b)
                print(f"FAIL {name}: luma mismatch {diff}/{len(y)} bytes")
                fails += 1
            else:
                print(f"OK   {name}: {w}x{h} byte-identical luma")
        # emit phase-2 inputs: real-encoder bitstreams, filter off
        ver = probe_abi()
        print(f"encoder ABI 0x{ver:04x}")
        for f in sorted(glob.glob(os.path.join(d, "*.src"))):
            name = os.path.basename(f)[:-4]
            pixels = open(f, "rb").read()
            webp = open(os.path.join(d, name + ".webp"), "rb").read()
            w = struct.unpack("<H", webp[26:28])[0] & 0x3FFF
            h = struct.unpack("<H", webp[28:30])[0] & 0x3FFF
            for q, m, s in ((75, 4, 4), (30, 0, 4), (95, 6, 1), (50, 2, 2)):
                rw = libwebp_encode_gray(pixels, w, h, q, m, s, ver)
                out = os.path.join(d, f"r_{name}_q{q}m{m}s{s}.webp")
                open(out, "wb").write(rw)
            # loop-filtered encodes: strengths/types/sharpness the repo
            # deblocker must reproduce exactly (incl. the libwebp default 60)
            for q, m, s, fs, ft, sh in (
                    (75, 4, 4, 60, 1, 0), (30, 0, 4, 100, 1, 0),
                    (50, 2, 2, 25, 0, 0), (95, 6, 1, 60, 1, 3),
                    (40, 4, 2, 80, 0, 5)):
                rw = libwebp_encode_gray(pixels, w, h, q, m, s, ver, fs, ft, sh)
                out = os.path.join(d, f"r_{name}_q{q}m{m}s{s}f{fs}t{ft}x{sh}.webp")
                open(out, "wb").write(rw)
            # multi-token-partition encodes (partitions=log2(nParts) 1..3):
            # certifies the parts(mby % nParts) row assignment and the
            # legal-empty-trailing-partition case (mbh < nParts on the
            # small fixtures) — the one accepted decode feature phase 2
            # previously never externally certified (r17 ADVICE item 2)
            for q, m, s, pt in ((75, 4, 4, 1), (50, 2, 2, 2), (95, 6, 1, 3)):
                rw = libwebp_encode_gray(pixels, w, h, q, m, s, ver,
                                         partitions=pt)
                out = os.path.join(d, f"r_{name}_q{q}m{m}s{s}p{pt}.webp")
                open(out, "wb").write(rw)
        print("phase-2 fixtures written; run Vp8Crosscheck dec, then --phase2")
    else:
        # phase 2: libwebp encoder -> repo decoder, byte-equal luma
        for f in sorted(glob.glob(os.path.join(d, "r_*.webp"))):
            name = os.path.basename(f)[:-5]
            data = open(f, "rb").read()
            ref = webp_decode_y(data)
            gray = os.path.join(d, name + ".gray")
            fc = os.path.join(d, name + ".failclosed")
            if os.path.exists(fc):
                print(f"FAIL {name}: repo decoder failed closed on an "
                      f"in-subset libwebp stream")
                fails += 1
                continue
            if not os.path.exists(gray):
                print(f"FAIL {name}: no repo decode output")
                fails += 1
                continue
            mine = open(gray, "rb").read()
            w, h, y = ref
            if y != mine:
                diff = sum(1 for a, b in zip(y, mine) if a != b)
                print(f"FAIL {name}: luma mismatch {diff}/{len(y)} bytes")
                fails += 1
            else:
                print(f"OK   {name}: {w}x{h} byte-identical luma")

    if fails:
        print(f"{fails} FAILURES")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
